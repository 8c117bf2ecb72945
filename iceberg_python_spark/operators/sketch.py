"""Count-min sketch frequency estimation and heavy hitters.

The third member of the engine's mergeable-sketch family (HLL++ for
distinct counts — ``source_token_sketch``; Bloom for membership —
``operators/bloom.py``): Cormode-Muthukrishnan count-min (J. Algorithms
2005) answers "how often does X occur?" and "what are the top items?"
over a corpus too large to groupBy-count exactly. Estimates NEVER
undercount; they overcount by at most ``eps * N`` (eps = e/width) with
probability 1 - delta (delta = e^-depth), N = total items.

Spark shape (100 TB): the per-row hash positions are JVM ``xxhash64``
columns (one per depth row, whole-stage codegen); each partition folds
its rows into ONE depth x width int64 grid via Arrow-batched
``mapInPandas``; the driver streams partition grids two-at-a-time and
adds them (counts are fully mergeable). Probing broadcasts the grid
once and reads mins in vectorized numpy — a scan-speed projection, no
shuffle anywhere. A 5 x 65536 grid is 2.6 MB and serves a corpus of
any size; the exact alternative is a full shuffle of every distinct
item. No reference counterpart (published-recipe operator).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# decorrelates the depth rows' hash streams (same trick as bloom.py)
_SEED_BASE = 0x9E3779B9


def _hash_cols(df: DataFrame, col: str, width: int, depth: int) -> DataFrame:
    return df.select(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(_SEED_BASE + d)), F.lit(width))
            .cast("int")
            .alias(f"_h{d}")
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, col: str, width: int = 65536, depth: int = 5, fanout: int = 64
) -> np.ndarray:
    """Fold ``df[col]`` into a count-min grid; returns int64
    ``(depth, width)``. Width trades memory for error (eps ~ e/width
    of total count); depth trades work for confidence (delta ~
    e^-depth). Above ``fanout`` input partitions the per-partition
    grids sum executor-side in coalesce tree levels before the driver
    fold — driver transfers bounded at ``fanout`` grids."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grid = np.zeros((depth, width), dtype=np.int64)
        for b in batches:
            if len(b) == 0:
                continue
            for d in range(depth):
                np.add.at(grid[d], b[f"_h{d}"].to_numpy(), 1)
        yield pd.DataFrame({"grid": [grid.tobytes()]})

    def merge_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            for buf in b["grid"]:
                arr = np.frombuffer(buf, dtype=np.int64)
                acc = arr.copy() if acc is None else acc + arr
        if acc is not None:
            yield pd.DataFrame({"grid": [acc.tobytes()]})

    from .bloom import _tree_reduce_partials

    parts = _hash_cols(df, col, width, depth).mapInPandas(fold, schema="grid binary")
    parts = _tree_reduce_partials(parts, merge_partials, "grid binary", fanout)
    acc = np.zeros((depth, width), dtype=np.int64)
    for row in parts.toLocalIterator():  # driver holds two grids at a time
        acc += np.frombuffer(row["grid"], dtype=np.int64).reshape(depth, width)
    return acc


def cms_estimate(
    df: DataFrame, col: str, grid: np.ndarray, out: str = "est_count"
) -> DataFrame:
    """Append ``out``: the count-min frequency estimate for ``col``
    (min over depth rows — never below the true count)."""
    depth, width = grid.shape
    bc = df.sparkSession.sparkContext.broadcast(grid.tobytes())
    cols = df.columns
    schema = df.withColumn(out, F.lit(0).cast("long")).schema

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.frombuffer(bc.value, dtype=np.int64).reshape(depth, width)
        for b in batches:
            if len(b) == 0:
                continue
            ests = np.stack(
                [g[d, b[f"_h{d}"].to_numpy()] for d in range(depth)]
            ).min(axis=0)
            res = b.drop(columns=[f"_h{d}" for d in range(depth)])
            res[out] = ests
            yield res

    with_h = df.withColumns(
        {
            f"_h{d}": F.pmod(F.xxhash64(F.col(col), F.lit(_SEED_BASE + d)), F.lit(width)).cast("int")
            for d in range(depth)
        }
    )
    return with_h.mapInPandas(probe, schema=schema).select(*cols, out)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    width: int = 65536,
    depth: int = 5,
    candidates_per_partition: int = 0,
) -> Tuple[DataFrame, np.ndarray]:
    """Top-``k`` values of ``col`` by count-min estimate; returns
    (DataFrame[col, est_count] descending, the grid).

    Candidates come from each partition's LOCAL top
    (``candidates_per_partition``, default ``4 * k``) — a SpaceSaving-
    style superset heuristic: a global heavy hitter is a local heavy
    hitter in at least one partition unless its mass is spread thinner
    than the local cutoff everywhere (pass a larger candidate budget
    for adversarially flat skew). Only the candidate union (tiny)
    shuffles; the corpus itself never does."""
    m = candidates_per_partition or 4 * k

    def local_top(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series = None
        for b in batches:
            if len(b) == 0:
                continue
            c = b[col].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is not None:
            yield pd.DataFrame({col: counts.nlargest(m).index})

    grid = cms_build(df, col, width, depth)
    cand = df.select(col).mapInPandas(local_top, schema=df.select(col).schema).distinct()
    top = (
        cms_estimate(cand, col, grid)
        .orderBy(F.col("est_count").desc(), F.col(col))
        .limit(k)
    )
    return top, grid


# ---------------------------------------------------------------------------
# HyperLogLog: mergeable distinct-count sketches as TABLES
# ---------------------------------------------------------------------------
# Spark's built-in approx_count_distinct answers one query; what an
# incremental corpus needs is the SKETCH ITSELF as a first-class,
# persistable, mergeable value (Flajolet et al., AofA 2007): sketch
# each crawl batch / partition / day once, store (group, sketch) rows,
# and answer "distinct URLs this month" by merging twelve sketch rows
# — never rescanning data. The defining algebraic property (and the
# oracle row's exact-equality claim): merge(sketch(A), sketch(B)) ==
# sketch(A ∪ B), register-for-register.
#
# Representation: a SPARSE sorted array<struct<bucket:int, rho:int>>
# (only occupied registers; at most 2^p entries, typically far fewer
# for small groups). Pure JVM built-ins throughout: bucket = low p
# bits of xxhash64, rho = leading-zero count of the remaining 64-p
# bits + 1 computed EXACTLY as 64 - p + 1 - length(bin(w)) — bin()'s
# string length is the integer bit length, with none of floor(log2())'s
# double-rounding edge cases. Build is groupBy(group, bucket).max(rho)
# then collect_list per group: shuffle O(groups · 2^p) rows, never the
# corpus.

_HLL_P_DEFAULT = 12  # 4096 registers, rsd ≈ 1.04/sqrt(4096) ≈ 1.6%


def _hll_rho(h, p: int):
    w = F.shiftrightunsigned(h, p)
    return (
        F.when(w == 0, F.lit(64 - p + 1))
        .otherwise(F.lit(64 - p + 1) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_build(
    df: DataFrame, col: str, group_cols: Sequence[str] = (), p: int = _HLL_P_DEFAULT
) -> DataFrame:
    """One sketch row per group: ``(group..., sketch)`` with ``sketch``
    a sparse sorted array of occupied (bucket, rho=max) registers.
    NULL values are ignored (SQL COUNT(DISTINCT) semantics)."""
    grp = list(group_cols)
    h = F.xxhash64(F.col(col))
    per_bucket = (
        df.where(F.col(col).isNotNull())
        .select(
            *grp,
            h.bitwiseAND(F.lit((1 << p) - 1)).cast("int").alias("_hb"),
            _hll_rho(h, p).alias("_hr"),
        )
        .groupBy(*grp, "_hb")
        .agg(F.max("_hr").alias("_hr"))
    )
    return per_bucket.groupBy(*grp).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_hb").alias("bucket"), F.col("_hr").alias("rho")))
        ).alias("sketch")
    )


def hll_merge(sketches: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge sketch rows (≥1 per group, e.g. one per crawl batch) into
    one per group: register-wise max. Shuffles only register rows —
    O(rows · occupied registers), data never re-read."""
    grp = list(group_cols)
    ex = sketches.select(*grp, F.explode("sketch").alias("_e")).select(
        *grp, F.col("_e.bucket").alias("_hb"), F.col("_e.rho").alias("_hr")
    )
    merged = ex.groupBy(*grp, "_hb").agg(F.max("_hr").alias("_hr"))
    return merged.groupBy(*grp).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_hb").alias("bucket"), F.col("_hr").alias("rho")))
        ).alias("sketch")
    )


def hll_estimate(
    sketches: DataFrame, group_cols: Sequence[str] = (), p: int = _HLL_P_DEFAULT
) -> DataFrame:
    """Append an ``est_distinct`` (double) column: the classic HLL
    estimator with the small-range linear-counting correction
    (E ≤ 2.5m with empty registers → m·ln(m/V)). A narrow projection —
    no shuffle, no Python."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)  # p >= 7 constant from the paper
    nz = F.size("sketch").cast("double")
    z = (F.lit(m) - nz) + F.aggregate(
        F.col("sketch"),
        F.lit(0.0),
        lambda acc, s: acc + F.lit(2.0) ** (-s["rho"].cast("double")),
    )
    e_raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - nz
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(e_raw)
    grp = list(group_cols)
    return sketches.select(*grp, "sketch", e.alias("est_distinct"))
