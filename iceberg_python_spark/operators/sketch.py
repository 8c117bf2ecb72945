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

from typing import Iterator, List, Tuple

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
