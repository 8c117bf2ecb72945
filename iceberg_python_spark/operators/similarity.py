"""Similarity search over embedding columns (array<float>).

- brute_force_cosine_topk — exact top-k neighbors; dot products JVM-side
  (zip_with + aggregate), queries broadcast, one window per query. The
  correctness baseline.
- lsh_ann_topk — sign-random-projection LSH: deterministic hyperplanes
  (seeded), candidates share a bucket (with multiprobe on 1-bit flips),
  exact re-rank on candidates only. The 100TB path: the bucket join
  touches a small fraction of the corpus per query.
- ivf_ann_topk — inverted-file index: spherical k-means centroids trained
  on a driver-side sample (IVF training is sample-based by construction),
  corpus assigned to cells in one vectorized Arrow pass, queries probe
  their nprobe nearest cells, exact re-rank on the joined candidates.
  Scans ~nprobe/n_centroids of the corpus per query.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
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
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose LSH bucket matches
    the query's bucket or any probe within ``multiprobe_bits`` bit flips
    of it (multiprobe), re-ranked exactly. Returns (query_id, id, cos,
    rank). Probe count is 1 + C(p,1) + ... + C(p,multiprobe_bits) —
    2-bit probing at 8 planes touches 37/256 of bucket space, trading
    ~2.6× candidate volume for roughly double the recall of 1-bit."""
    dim = len(corpus.select(vec_col).head()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = with_lsh_bucket(corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), "_cv", planes)
    c = c.withColumn("_cn", _norm("_cv"))
    q = with_lsh_bucket(queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")), "_qv", planes)
    q = q.withColumn("_qn", _norm("_qv"))
    if multiprobe:
        masks = [0] + [1 << j for j in range(n_planes)]
        if multiprobe_bits >= 2:
            from itertools import combinations

            masks += [(1 << a) | (1 << b) for a, b in combinations(range(n_planes), 2)]
        probes = F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
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


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 64,
    sample_size: int = 20000,
    iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Spherical k-means centroids from a deterministic corpus sample.

    Driver-side Lloyd iterations on <= sample_size vectors: IVF training
    is sample-based by construction (a 100 TB corpus trains on the same
    few-10k sample; only assignment touches every row). Vectors and
    centroids are L2-normalized so nearest-by-dot == nearest-by-cosine.
    Returns an (n_centroids, dim) float64 array; empty clusters keep
    their previous centroid so the count is stable."""
    n = corpus.count()
    frac = min(1.0, (sample_size * 1.2) / max(n, 1))
    sample = corpus.select(vec_col).sample(False, frac, seed).limit(sample_size).collect()
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def with_ivf_cell(df: DataFrame, vec_col: str, centroids: np.ndarray, nprobe: int = 1, out: str = "cell") -> DataFrame:
    """Attach the nprobe nearest centroid ids (array<int>) in one
    vectorized Arrow pass: each batch is a (rows, dim) matmul against the
    centroid matrix — no per-row Python."""
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    np_ = min(nprobe, len(C))

    @F.pandas_udf(ArrayType(IntegerType()))
    def nearest_cells(vs: pd.Series) -> pd.Series:
        M = np.asarray(vs.tolist(), dtype=np.float64)
        if M.size == 0:
            return pd.Series([], dtype=object)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T
        top = np.argpartition(-sims, np_ - 1, axis=1)[:, :np_] if np_ < sims.shape[1] else np.argsort(-sims, axis=1)
        # order probes best-first (argpartition is unordered)
        rows = np.take_along_axis(sims, top, axis=1)
        order = np.argsort(-rows, axis=1)
        top = np.take_along_axis(top, order, axis=1)
        return pd.Series([row.astype("int32").tolist() for row in top])

    return df.withColumn(out, nearest_cells(F.col(vec_col)))


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    sample_size: int = 20000,
    seed: int = 13,
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """IVF approximate top-k (FAISS IVF-flat shape, Spark-native):

    1. train centroids on a sample (or reuse a passed-in index),
    2. assign each corpus row to its single nearest cell (narrow pass),
    3. explode each query to its nprobe nearest cells,
    4. equi-join on cell id — candidates are ~nprobe/n_centroids of the
       corpus — and re-rank exactly (JVM-side cosine, same rounding and
       tiebreak as brute_force_cosine_topk, so nprobe=n_centroids
       reproduces the exact result).

    Returns (query_id, id, cos, rank). The cell equi-join broadcasts the
    exploded queries; corpus cells stay partitioned, so the probe scales
    out with executors. Hot cells (skewed data) bound the candidate set
    per query at cell granularity — lower n_centroids/raise nprobe to
    trade recall for balance."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, n_centroids=n_centroids, sample_size=sample_size, seed=seed
        )
    c = with_ivf_cell(corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), "_cv", centroids, nprobe=1)
    c = c.select(id_col, "_cv", F.col("cell")[0].alias("cell")).withColumn("_cn", _norm("_cv"))
    q = with_ivf_cell(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv")), "_qv", centroids, nprobe=nprobe
    )
    q = q.select(query_id_col, "_qv", F.explode("cell").alias("cell")).withColumn("_qn", _norm("_qv"))
    scored = F.broadcast(q).join(c, "cell").withColumn(
        "cos", F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.select(query_id_col, F.col(id_col), "cos")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    m: int = 8,
    nbits: int = 4,
    sample_size: int = 20000,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Product-quantization codebooks: split the (L2-normalized) vector
    into ``m`` contiguous subvectors and k-means each subspace to
    ``2**nbits`` codewords on a deterministic driver-side sample — PQ
    training is sample-based by construction, like IVF. Returns an
    (m, 2**nbits, dim/m) float64 array."""
    n = corpus.count()
    frac = min(1.0, (sample_size * 1.2) / max(n, 1))
    sample = corpus.select(vec_col).sample(False, frac, seed).limit(sample_size).collect()
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(2**nbits, len(X))
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=ksub, replace=False)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def with_pq_code(df: DataFrame, vec_col: str, codebooks: np.ndarray, out: str = "code") -> DataFrame:
    """Attach the PQ code (array<int>, length m) in one vectorized Arrow
    pass: per subspace, a (rows, ksub) distance matrix against the
    codebook — no per-row Python. At 100 TB this is THE compression step:
    a d-float embedding (d·4 bytes) becomes m small ints; candidate
    generation then reads codes only, never raw vectors."""
    from pyspark.sql.types import ArrayType, IntegerType

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(vs: pd.Series) -> pd.Series:
        M = np.asarray(vs.tolist(), dtype=np.float64)
        if M.size == 0:
            return pd.Series([], dtype=object)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        codes = np.empty((M.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = M[:, j * dsub : (j + 1) * dsub]
            # ||s-c||^2 = ||s||^2 - 2 s·c + ||c||^2 ; argmin over c
            d2 = -2.0 * (S @ B[j].T) + (B[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return df.withColumn(out, encode(F.col(vec_col)))


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    k: int = 10,
    m: int = 8,
    nbits: int = 4,
    rerank_factor: int = 4,
    sample_size: int = 20000,
    seed: int = 7,
    codebooks: Optional[np.ndarray] = None,
) -> DataFrame:
    """Product-quantization approximate top-k (FAISS PQ + ADC shape,
    Spark-native):

    1. train per-subspace codebooks on a sample (or reuse an index),
    2. encode the corpus to m-byte codes (narrow Arrow pass),
    3. ADC: each query precomputes an (m, ksub) lookup table of
       subvector dot products; a corpus row's approximate cosine is the
       sum of m table lookups on its code — computed for ALL queries in
       one vectorized pass over the codes, raw vectors never touched,
    4. keep the top k·rerank_factor per query by approximate score,
       re-rank exactly (same rounding + tiebreak as
       brute_force_cosine_topk), emit top-k.

    Returns (query_id, id, cos, rank). The LUT batch is tiny
    (n_queries · m · 2^nbits doubles, broadcast into the UDF closure);
    the candidate explode is bounded by n_queries like the brute-force
    baseline, but reads 16-64× fewer bytes per corpus row."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, vec_col, m=m, nbits=nbits, sample_size=sample_size, seed=seed
        )
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m_, ksub, dsub = B.shape

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # LUT[qi, j, c] = q_sub(j) · codeword(j, c); approx cos = sum_j LUT[qi, j, code_j]
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m_, dsub), B)

    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def adc_scores(codes: pd.Series) -> pd.Series:
        Mc = np.asarray(codes.tolist(), dtype=np.int64)
        if Mc.size == 0:
            return pd.Series([], dtype=object)
        cols = np.arange(m_)[None, :]
        out = np.empty((Mc.shape[0], lut.shape[0]))
        for qi in range(lut.shape[0]):
            out[:, qi] = lut[qi][cols, Mc].sum(axis=1)
        return pd.Series([row.tolist() for row in out])

    coded = with_pq_code(corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), "_cv", B)
    qid_arr = F.array(*[F.lit(q) for q in qids])
    approx = (
        coded.withColumn("_scores", adc_scores(F.col("code")))
        .select(F.col(id_col), "_cv", F.posexplode("_scores").alias("_qi", "_approx"))
        .withColumn(query_id_col, F.element_at(qid_arr, F.col("_qi") + 1))
    )
    wa = Window.partitionBy(query_id_col).orderBy(F.col("_approx").desc(), F.col(id_col).asc())
    cand = approx.withColumn("_arank", F.row_number().over(wa)).where(
        F.col("_arank") <= k * rerank_factor
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn"))
    scored = cand.join(F.broadcast(q), query_id_col).withColumn(
        "cos", F.round(_dot("_qv", "_cv") / (F.col("_qn") * _norm("_cv")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.select(query_id_col, F.col(id_col), "cos")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_cluster(
    df: DataFrame,
    vec_col: str,
    n_clusters: int = 64,
    sample_size: int = 20000,
    iters: int = 10,
    seed: int = 42,
    out: str = "cluster",
) -> DataFrame:
    """Semantic clustering: spherical k-means centroids trained on a
    deterministic corpus sample (the same driver-side training stance
    every IVF/PQ index takes — centroids are metadata, the corpus pass
    is what must scale), then ONE vectorized Arrow assignment pass
    attaches the nearest-centroid id. No shuffle: the assignment is a
    narrow projection against a broadcast centroid matrix."""
    centroids = train_ivf_centroids(
        df, vec_col, n_centroids=n_clusters, sample_size=sample_size, iters=iters, seed=seed
    )
    clustered = with_ivf_cell(df, vec_col, centroids, nprobe=1, out="_cells")
    return clustered.withColumn(out, F.col("_cells")[0]).drop("_cells")


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 64,
    threshold: float = 0.95,
    sample_size: int = 20000,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space near-duplicate
    removal at corpus scale — cluster with k-means, find cosine
    near-duplicate pairs WITHIN each cluster, keep the lowest-id doc of
    every near-dup component.

    The cluster id is the blocking key, so the quadratic pair join is
    bounded per cluster (n/k docs on average) instead of n² — the whole
    point of the SemDeDup recipe; cross-cluster near-dups are the
    documented approximation. Composition of existing scale-shaped
    pieces: kmeans_cluster (narrow assignment), embedding_neardup_pairs
    (blocked self-join, JVM-side dot products), connected_components
    (union-find / hash-min). Returns the kept rows of ``df``."""
    from .dedup import connected_components, embedding_neardup_pairs

    clustered = kmeans_cluster(
        df, vec_col, n_clusters=n_clusters, sample_size=sample_size, seed=seed
    )
    pairs = embedding_neardup_pairs(clustered, id_col, vec_col, ["cluster"], threshold)
    comps = connected_components(pairs)
    drop = comps.where(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def kmeans_fit(
    corpus: DataFrame,
    vec_col: str,
    k: int = 8,
    iters: int = 10,
    seed: int = 13,
    tol: float = 1e-6,
    init_sample: int = 10000,
):
    """FULL-corpus distributed Lloyd's k-means (Euclidean) — the
    cluster structure behind balanced mixture sampling and
    SemDeDup-style per-cluster curation.

    Unlike :func:`train_ivf_centroids` (sample-based by design), every
    iteration aggregates over the ENTIRE corpus, in the only shape
    that survives 100 TB:

    - centroids (k × d, a few MB) broadcast each iteration;
    - one ``mapInPandas`` pass emits k PARTIAL rows per partition
      (cluster, component-sum vector, count, inertia) — assignment is
      a single (rows × d) @ (d × k) matmul per Arrow batch, never
      per-row Python;
    - partials reduce by cluster with ``aggregate(zip_with(...))``
      (elementwise array sum, JVM-side), so the per-iteration shuffle
      is O(partitions · k) ROWS regardless of corpus size, and only k
      combined rows ever reach the driver.

    Init: k-means++ on a seeded driver-side sample (bounded by
    ``init_sample``). Empty clusters keep their previous centroid.
    Returns ``(centroids ndarray (k, d), inertia_per_iter list)`` —
    inertia is evaluated at assignment time, so Lloyd's guarantees the
    sequence is non-increasing.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty corpus")
    d = len(first[0])
    n = corpus.count()
    frac = min(1.0, (init_sample * 1.2) / max(n, 1))
    sample = corpus.select(vec_col).sample(False, frac, seed).limit(init_sample).collect()
    if len(sample) < min(k, n):
        # a tiny frac draw can come back empty (rng.randint(0) would
        # be an unhelpful IndexError) or shorter than k, which would
        # silently return k_eff < k centroids while callers assume
        # exactly k (ADVICE r12) — top up deterministically.
        sample = corpus.select(vec_col).limit(max(init_sample, k)).collect()
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    if len(X) < k:
        raise ValueError(
            f"kmeans_fit: corpus has only {len(X)} rows but k={k}; "
            "need at least k distinct rows to seed k clusters"
        )
    rng = np.random.RandomState(seed)
    k_eff = min(k, len(X))
    # k-means++ seeding on the sample
    C = X[rng.randint(len(X))][None, :]
    for _ in range(1, k_eff):
        d2 = np.min(((X[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
        p = d2 / max(d2.sum(), 1e-300)
        C = np.vstack([C, X[rng.choice(len(X), p=p)]])

    partial_schema = "cluster int, psum array<double>, cnt long, pinertia double"
    inertias = []
    for _ in range(iters):
        Cb = C.copy()

        def partials(batches, _C=Cb):
            c_sq = (_C * _C).sum(axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                M = np.asarray(pdf["v"].tolist(), dtype=np.float64)
                d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ _C.T) + c_sq[None, :]
                assign = np.argmin(d2, axis=1)
                rows = []
                for j in np.unique(assign):
                    sel = assign == j
                    rows.append(
                        {
                            "cluster": int(j),
                            "psum": M[sel].sum(axis=0).tolist(),
                            "cnt": int(sel.sum()),
                            "pinertia": float(np.maximum(d2[sel, j], 0.0).sum()),
                        }
                    )
                yield pd.DataFrame(rows)

        agg = (
            corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
            .mapInPandas(partials, schema=partial_schema)
            .groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("psum"),
                    F.array_repeat(F.lit(0.0), d),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("s"),
                F.sum("cnt").alias("n"),
                F.sum("pinertia").alias("i"),
            )
            .collect()
        )
        new_C = C.copy()
        total_inertia = 0.0
        for row in agg:
            total_inertia += row["i"]
            if row["n"]:
                new_C[row["cluster"]] = np.asarray(row["s"], dtype=np.float64) / row["n"]
        inertias.append(total_inertia)
        shift = float(np.abs(new_C - C).max())
        C = new_C
        if shift < tol:
            break
    return C, inertias


def kmeans_assign(df: DataFrame, vec_col: str, centroids: np.ndarray, out: str = "cluster") -> DataFrame:
    """Attach the nearest-centroid id in one vectorized Arrow pass
    (same matmul trick as the fit's assignment step)."""
    from pyspark.sql.types import IntegerType

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def nearest(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int32")
        M = np.asarray(vs.tolist(), dtype=np.float64)
        d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + c_sq[None, :]
        return pd.Series(np.argmin(d2, axis=1).astype("int32"))

    return df.withColumn(out, nearest(F.col(vec_col).cast("array<double>")))


def pca_fit(
    corpus: DataFrame,
    vec_col: str,
    k: int = 16,
):
    """Distributed PCA over an embedding column — the dimensionality
    step in front of ANN indexing and semantic dedup (a 64→16
    projection cuts every downstream distance computation 4×; OPQ/PCA
    rotation is also how production IVF pipelines whiten vectors).

    The only scalable shape for tall-skinny data (n ≫ d): one
    ``mapInPandas`` pass emits per-partition MOMENT partials — the
    (d × d) Gram matrix ``Xᵀ X``, the component sum, and the row count
    (O(partitions · d²) numbers shuffle, never the corpus) — the
    driver assembles the covariance ``Σ = (XᵀX − n·μμᵀ)/(n−1)`` and
    eigendecomposes the tiny d×d matrix (numpy ``eigh``; deterministic
    sign fix: each component's largest-|coefficient| entry is made
    positive). No iteration, one pass, exact — not a sketch.

    Returns ``(mean (d,), components (k, d) row-major, explained_var
    (k,), total_var float)``.
    """
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("pca_fit: empty corpus")
    d = len(first[0])
    if not 1 <= k <= d:
        raise ValueError(f"pca_fit: k={k} outside [1, d={d}]")

    def partials(batches):
        gram = np.zeros((d, d), dtype=np.float64)
        s = np.zeros(d, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            gram += M.T @ M
            s += M.sum(axis=0)
            n += len(M)
        if n:
            yield pd.DataFrame(
                {"gram": [gram.reshape(-1).tolist()], "s": [s.tolist()], "n": [n]}
            )

    parts = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(partials, schema="gram array<double>, s array<double>, n long")
        .collect()
    )
    gram = np.zeros((d, d), dtype=np.float64)
    s = np.zeros(d, dtype=np.float64)
    n = 0
    for row in parts:
        gram += np.asarray(row["gram"], dtype=np.float64).reshape(d, d)
        s += np.asarray(row["s"], dtype=np.float64)
        n += row["n"]
    if n < 2:
        raise ValueError(f"pca_fit: needs >= 2 rows, got {n}")
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    # deterministic sign: the largest-|coeff| entry of each component
    # is positive (eigh's sign is arbitrary)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    explained = np.maximum(evals[order], 0.0)
    total = float(np.maximum(evals, 0.0).sum())
    return mean, comps, explained, total


def pca_transform(
    df: DataFrame, vec_col: str, mean: np.ndarray, components: np.ndarray,
    out: str = "pca",
) -> DataFrame:
    """Project embeddings onto the fitted components in one vectorized
    Arrow pass: ``(X - μ) @ Cᵀ`` per batch (same broadcast-matmul
    shape as :func:`kmeans_assign`)."""
    from pyspark.sql.types import ArrayType, DoubleType

    mu = np.ascontiguousarray(mean, dtype=np.float64)
    C = np.ascontiguousarray(components, dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        M = np.asarray(v.tolist(), dtype=np.float64)
        P = (M - mu) @ C.T
        return pd.Series(list(P))

    return df.withColumn(out, project(F.col(vec_col).cast("array<double>")))


def quantize_embeddings(
    df: DataFrame, vec_col: str, id_col: str, levels: int = 256
) -> Tuple[DataFrame, List[float], List[float]]:
    """Per-dimension scalar quantization of an embedding column — the
    standard 4× storage cut (float32 → uint8) a 100 TB embedding table
    takes BEFORE any indexing; PQ/IVF then build on top of (or instead
    of) it. Returns ``(quantized_df, mins, maxs)`` where the df carries
    ``q`` (array<int> of 0..levels-1) alongside ``id_col``, and the
    per-dimension min/max lists are the dequantization codebook
    (metadata-sized: 2·d floats — persist them as table properties).

    Exactly reproducible across engines: the per-dimension min/max are
    EXACT aggregates (no accumulation error), the quantizer is
    ``floor((v − lo_i) · (levels−1)/(hi_i − lo_i) + 0.5)`` — one
    correctly-rounded subtract/multiply/add each, identical in any
    IEEE engine (half-up, not banker's rounding, precisely so the
    oracle matches bit-for-bit). Constant dimensions quantize to 0.

    Spark shape (100 TB): the stats pass is one posexplode + groupBy
    over d keys (map-side combined — the shuffle carries
    O(partitions·d) rows); the collected stats are 2·d scalars on the
    driver; quantization itself is a narrow Catalyst ``transform``
    projection, no Python, no second shuffle."""
    if levels < 2 or levels > 65536:
        raise ValueError(f"levels must be in 2..65536, got {levels}")
    ex = df.select(
        F.posexplode(F.col(vec_col)).alias("_i", "_v")
    ).groupBy("_i").agg(F.min("_v").alias("lo"), F.max("_v").alias("hi"))
    stats = {int(r["_i"]): (float(r["lo"]), float(r["hi"])) for r in ex.collect()}
    if not stats:
        raise ValueError("quantize_embeddings: empty or all-null vector column")
    d = max(stats) + 1
    if d > 16384:  # the codebook becomes plan literals — keep it sane
        raise ValueError(f"quantize_embeddings: dimension {d} exceeds 16384")
    mins = [stats[i][0] for i in range(d)]
    maxs = [stats[i][1] for i in range(d)]
    lo_arr = F.array(*[F.lit(v).cast("double") for v in mins])
    # scale computed driver-side as one double per dim (exact inputs,
    # one correctly-rounded division — same value any engine computes)
    scales = [
        0.0 if maxs[i] == mins[i] else (levels - 1) / (maxs[i] - mins[i]) for i in range(d)
    ]
    sc_arr = F.array(*[F.lit(v).cast("double") for v in scales])
    idx = F.transform(F.col(vec_col), lambda _, i: i)
    q = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        idx,
        lambda v, i: F.floor(
            (v - F.element_at(lo_arr, i + 1)) * F.element_at(sc_arr, i + 1) + F.lit(0.5)
        ).cast("int"),
    )
    return df.select(F.col(id_col), q.alias("q")), mins, maxs


def dequantize_col(q_col, mins: List[float], maxs: List[float], levels: int = 256):
    """Column expression reconstructing approximate float vectors from
    :func:`quantize_embeddings` output: ``lo_i + q·(hi_i−lo_i)/(levels−1)``.
    Max per-element error is half a quantization step."""
    lo_arr = F.array(*[F.lit(v).cast("double") for v in mins])
    steps = [
        0.0 if maxs[i] == mins[i] else (maxs[i] - mins[i]) / (levels - 1)
        for i in range(len(mins))
    ]
    st_arr = F.array(*[F.lit(v).cast("double") for v in steps])
    idx = F.transform(q_col, lambda _, i: i)
    return F.zip_with(
        q_col.cast("array<double>"),
        idx,
        lambda v, i: F.element_at(lo_arr, i + 1) + v * F.element_at(st_arr, i + 1),
    )
