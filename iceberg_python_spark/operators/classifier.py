"""Model-based quality filtering: a hashed n-gram linear classifier
(fasttext-style) trained and applied entirely inside Spark.

The standard curation stage the heuristic text filters can't cover:
label a few thousand docs (high-quality reference vs crawl junk),
train a linear model over hashed uni+bigram features, score the whole
corpus, keep the top slice. Shapes chosen for 100 TB:

- **Featurization is engine-parity by construction**: tokens use the
  same normalization as the other text operators; a gram's feature id
  is ``int(md5(gram)[:8], 16) % dim`` — computable with built-ins in
  BOTH Spark (``conv(substring(md5(g),1,8),16,10)``) and DuckDB
  (``CAST('0x' || substring(md5(g),1,8) AS BIGINT)``), so scoring has
  a full value-hash oracle and the Python (training) and JVM
  (scoring) paths provably agree.
- **Training** is full-batch logistic regression: per iteration the
  weight vector (dim × 8 bytes, a few hundred KB) broadcasts, ONE
  ``mapInPandas`` pass emits a per-partition gradient partial, and
  partials reduce with ``aggregate(zip_with(...))`` — per-iteration
  shuffle is O(partitions) ROWS, one dim-vector reaching the driver.
- **Scoring** never leaves the JVM, and for dim ≤ 2^16 never shuffles:
  the weight vector is ONE array literal and the per-doc logit is an
  ``aggregate`` fold over the gram-bucket array — a narrow map-only
  plan. Larger models explode distinct grams → bucket → broadcast-join
  the weight table → sum per doc.

Binary presence features (distinct grams per doc) keep the SQL oracle
exact and make scores length-robust; weights are float64 (training)
or caller-supplied integers (integer-exact oracle rows).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: iteration-frame partition count of the most recent
#: train_quality_classifier run — exposed so tests can pin the
#: scale-adaptive width derivation (no fixed local-mode cap)
_last_iteration_width: int | None = None

_NORM_RE = re.compile(r"[^a-z0-9\s]")

#: a training set at most this many rows (== one rows_per_partition
#: quantum, so the iteration frame is ONE partition) runs all gradient
#: passes fused inside that single task; tests set 0 to force the
#: distributed per-iteration loop for parity checks
_FUSE_MAX_ROWS = 2048

# Largest weight dim shipped as a single array literal in the scoring
# plan (8 B/entry → ≤512 KiB per task binary); larger models take the
# explode + broadcast-join path.
_FOLD_DIM_MAX = 1 << 16


def _doc_buckets(text: str, dim: int) -> np.ndarray:
    """Python featurizer — MUST match the SQL expressions in
    :func:`gram_bucket_col` (same normalization, same md5 bucketing)."""
    toks = [t for t in _NORM_RE.sub(" ", (text or "").lower()).split() if t]
    grams = set(toks)
    grams.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    if not grams:
        return np.empty(0, dtype=np.int64)
    ids = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim for g in grams]
    return np.unique(np.asarray(ids, dtype=np.int64))


def gram_bucket_col(text_col: str, dim: int):
    """JVM-side (doc → array of DISTINCT gram bucket ids) expression —
    built-ins only, engine-parity with :func:`_doc_buckets`.

    Bigrams pair ``toks`` with a 1-shifted copy via ``zip_with`` rather
    than indexing ``toks`` inside a ``transform`` lambda: an outer array
    expression referenced inside a higher-order-function lambda is
    re-evaluated PER ELEMENT (no CSE across the lambda boundary), which
    made tokenization O(tokens²) per document — 10× slower end-to-end.
    The shifted copy pads with one NULL so the last token pairs to a
    unigram (``concat_ws`` skips NULLs) that the ``contains(" ")``
    filter drops, exactly as the old per-index form did."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+"
    )
    toks = F.filter(toks, lambda t: t != "")
    shifted = F.slice(
        F.concat(toks, F.array(F.lit(None).cast("string"))),
        2,
        F.greatest(F.size(toks), F.lit(1)),
    )
    bigrams = F.filter(
        F.zip_with(toks, shifted, lambda a, b: F.concat_ws(" ", a, b)),
        lambda g: g.contains(" "),
    )
    grams = F.array_distinct(F.concat(toks, bigrams))
    return F.array_distinct(
        F.transform(
            grams,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % dim,
        )
    )


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str,
    dim: int = 4096,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
):
    """Full-batch logistic regression over hashed n-gram presence
    features. Returns ``(weights (dim,) float64, bias, losses)`` with
    ``losses`` the per-iteration mean log-loss (non-increasing for a
    sane lr on separable data)."""
    labeled = pos.select(F.col(text_col).alias("t"), F.lit(1.0).alias("y")).unionByName(
        neg.select(F.col(text_col).alias("t"), F.lit(0.0).alias("y"))
    )

    # featurize ONCE: the hashed gram buckets of a document never change
    # across iterations, so md5-hashing every gram anew in each of the
    # ``iters`` gradient passes is pure waste (guide §1.2 — fix the
    # per-task work after the pass structure). The checkpointed frame
    # carries only (idx array, y); per-iteration passes are then a
    # sigmoid + scatter-add over precomputed indices.
    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "idx": [
                        _doc_buckets(text, dim).tolist() for text in pdf["t"]
                    ],
                    "y": pdf["y"].astype(float),
                }
            )

    # checkpoint at the featurize pass's NATURAL width — a coalesce
    # placed before the checkpoint would narrow the whole upstream
    # stage (no shuffle boundary), running the expensive hashing
    # mapInPandas in that many tasks regardless of input size
    feat = labeled.mapInPandas(featurize, schema="idx array<int>, y double")
    feat = feat.localCheckpoint(eager=True)
    n = feat.count()
    if n == 0:
        raise ValueError("train_quality_classifier: empty training set")
    # narrow the ITERATION frame only, with a width derived from the
    # data (guide §2: scale-adaptive partitioning, not a local-mode
    # constant): each of the ``iters`` gradient passes pays one Python
    # task round trip per partition and the driver-side reduce folds
    # one dim-vector per partition, so near-empty partitions are pure
    # overhead — ~2k docs per partition, clamped to the session width
    # so a large corpus keeps its configured parallelism. coalesce on
    # the checkpointed blocks merges at read time (no shuffle) and
    # never widens, so it only ever REDUCES the pass width.
    sc = feat.sparkSession.sparkContext
    it_parts = max(1, min(sc.defaultParallelism, (n + 2047) // 2048))
    if it_parts < feat.rdd.getNumPartitions():
        feat = feat.coalesce(it_parts)
    global _last_iteration_width
    _last_iteration_width = feat.rdd.getNumPartitions()
    if _last_iteration_width == 1 and n <= _FUSE_MAX_ROWS:
        # the whole (small, <= one rows_per_partition quantum) training
        # set sits in ONE partition, so that task
        # already holds the full batch: run every gradient pass inside
        # it — same float64 arithmetic in the same order as the
        # distributed loop's (one-partition) reduce, ONE job instead of
        # ``iters`` sequential job+collect round trips (guide §1.2).
        # Multi-partition inputs keep the per-iteration broadcast +
        # partial-reduce loop below: a fused pass would turn full-batch
        # gradients into local ones, which is a different algorithm.
        def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = [pdf for pdf in batches if len(pdf)]
            w = np.zeros(dim, dtype=np.float64)
            b = 0.0
            losses: List[float] = []
            for _ in range(iters):
                g = np.zeros(dim, dtype=np.float64)
                gb = 0.0
                loss = 0.0
                for pdf in parts:
                    for idx, y in zip(pdf["idx"], pdf["y"]):
                        idx = np.asarray(idx, dtype=np.int64)
                        z = b + w[idx].sum()
                        p = 1.0 / (1.0 + np.exp(-z))
                        err = p - y
                        g[idx] += err
                        gb += err
                        eps = 1e-12
                        loss -= y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
                w = w - lr * (g / n + l2 * w)
                b = b - lr * gb / n
                losses.append(float(loss) / n)
            yield pd.DataFrame(
                [{"w": w.tolist(), "b": float(b), "losses": losses}]
            )

        row = feat.mapInPandas(
            fused, schema="w array<double>, b double, losses array<double>"
        ).collect()[0]
        return np.asarray(row["w"], dtype=np.float64), float(row["b"]), list(row["losses"])
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    losses: List[float] = []
    for _ in range(iters):
        wb, bb = w.copy(), b

        def partials(batches: Iterator[pd.DataFrame], _w=wb, _b=bb) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                g = np.zeros(dim, dtype=np.float64)
                gb = 0.0
                loss = 0.0
                for idx, y in zip(pdf["idx"], pdf["y"]):
                    idx = np.asarray(idx, dtype=np.int64)
                    z = _b + _w[idx].sum()
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = p - y
                    g[idx] += err
                    gb += err
                    eps = 1e-12
                    loss -= y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
                yield pd.DataFrame(
                    [{"g": g.tolist(), "gb": float(gb), "loss": float(loss)}]
                )

        agg = (
            feat.mapInPandas(partials, schema="g array<double>, gb double, loss double")
            .agg(
                F.aggregate(
                    F.collect_list("g"),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
                ).alias("g"),
                F.sum("gb").alias("gb"),
                F.sum("loss").alias("loss"),
            )
            .collect()[0]
        )
        grad = np.asarray(agg["g"], dtype=np.float64) / n + l2 * w
        w = w - lr * grad
        b = b - lr * float(agg["gb"]) / n
        losses.append(float(agg["loss"]) / n)
    return w, b, losses


def score_quality_classifier(
    df: DataFrame,
    text_col: str,
    weights,
    bias: float = 0.0,
    out: str = "quality_logit",
    id_col: str | None = None,
) -> DataFrame:
    """Score every document JVM-side. Rows with no grams score exactly
    ``bias``. Keeps all input columns.

    For ``dim`` ≤ 2^16 the weight vector ships as ONE array literal and
    the score is an ``aggregate`` fold over the gram-bucket array —
    a fully NARROW map-only plan (zero shuffle, zero join, no Python):
    per-document scoring is embarrassingly parallel and the plan should
    say so. Beyond that, fall back to explode → broadcast-joined weight
    table → per-doc sum (the literal would bloat every task binary).

    In the fallback, pass ``id_col`` (a unique key): the per-doc sum
    then shuffles only (id, bucket weight) pairs and the remaining
    columns re-attach by an equi-join on the key — without it the
    groupBy key is EVERY column, which drags full document text through
    the shuffle. The fold path ignores ``id_col`` (nothing shuffles)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    w = np.asarray(weights, dtype=np.float64)
    dim = len(w)
    if dim <= _FOLD_DIM_MAX:
        warr = F.lit([float(x) for x in w])
        score = F.aggregate(
            F.coalesce(gram_bucket_col(text_col, dim), F.array()),
            F.lit(float(bias)),
            lambda acc, bkt: acc
            + F.coalesce(F.try_element_at(warr, (bkt + F.lit(1)).cast("int")), F.lit(0.0)),
        )
        return df.withColumn(out, score)
    nz = np.flatnonzero(w)
    from iceberg_python_spark.operators._local import local_rows_df

    wdf = F.broadcast(
        local_rows_df(
            spark, [(int(i), float(w[i])) for i in nz], "bucket: long, w: double"
        )
    )
    buckets = gram_bucket_col(text_col, dim)
    if id_col is not None:
        exploded = df.select(F.col(id_col), F.explode_outer(buckets).alias("bucket"))
        sums = (
            exploded.join(wdf, "bucket", "left")
            .groupBy(id_col)
            .agg((F.coalesce(F.sum("w"), F.lit(0.0)) + F.lit(float(bias))).alias(out))
        )
        return df.join(sums, id_col)
    with_b = df.withColumn("_qb", buckets)
    exploded = with_b.select("*", F.explode_outer("_qb").alias("bucket"))
    return (
        exploded.join(wdf, "bucket", "left")
        .groupBy(*[c for c in with_b.columns if c != "_qb"])
        .agg((F.coalesce(F.sum("w"), F.lit(0.0)) + F.lit(float(bias))).alias(out))
        .drop("_qb")
    )
