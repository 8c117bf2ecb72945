"""Similarity search over embedding columns (array<float>).

- brute_force_cosine_topk — exact top-k neighbors; dot products JVM-side
  (zip_with + aggregate), queries broadcast, one window per query. The
  correctness baseline.
- lsh_ann_topk — sign-random-projection LSH: deterministic hyperplanes
  (seeded), candidates share a bucket (with multiprobe on 1-bit flips),
  exact re-rank on candidates only. The 100TB path: the bucket join
  touches a small fraction of the corpus per query.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda s, x: s + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")))


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window-ranked.

    Returns (query_id, id, cos, rank). Deterministic tiebreak on id."""
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"), _norm(vec_col).alias("_cn"))
    scored = F.broadcast(q).crossJoin(c).withColumn("cos", F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col), "cos", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic Gaussian hyperplanes for sign-projection LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def with_lsh_bucket(df: DataFrame, vec_col: str, planes: List[List[float]], out: str = "bucket") -> DataFrame:
    """Pack sign(v·h_j) bits into an int bucket id (JVM-side arithmetic)."""
    bucket = F.lit(0).cast("long")
    for j, h in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(_dot(F.col(vec_col), lit_plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, j))
    return df.withColumn(out, bucket)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose LSH bucket matches
    the query's bucket or any 1-bit flip of it (multiprobe), re-ranked
    exactly. Returns (query_id, id, cos, rank)."""
    dim = len(corpus.select(vec_col).head()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = with_lsh_bucket(corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), "_cv", planes)
    c = c.withColumn("_cn", _norm("_cv"))
    q = with_lsh_bucket(queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")), "_qv", planes)
    q = q.withColumn("_qn", _norm("_qv"))
    if multiprobe:
        probes = F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])
        q = q.select(query_id_col, "_qv", "_qn", F.explode(probes).alias("bucket"))
    joined = F.broadcast(q).join(c, "bucket")
    scored = joined.withColumn("cos", F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.select(query_id_col, F.col(id_col), "cos")
        .dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
