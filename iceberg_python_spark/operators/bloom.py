"""Distributed Bloom filter for join-free membership dedup.

The Dolma-style (Soldaini et al. 2024, the public dolma toolkit's
BloomFilter deduper) scale path for "have we already ingested this?":
build a fixed-size bit array over a corpus ONCE, then test any stream
against it as a pure projection — no shuffle, no join, no state growth.
The classic use cases at 100 TB:

- incremental exact dedup: filter a new crawl against the bloom of
  everything already ingested (vs an anti-join whose shuffle grows
  with the full history);
- decontamination: test training docs against a bloom of benchmark
  grams without materializing the gram join.

Hashing is Kirsch-Mitzenmacher double hashing: k positions derive from
two JVM-side ``xxhash64`` values as ``(h1 + i*h2) mod m`` — the same
uint64 numpy arithmetic on both the build and probe paths, so the
filter is reproducible across sessions. No false negatives ever; the
false-positive rate is the standard ``(1 - e^(-kn/m))^k``.

Spark shape: build = one narrow pass emitting ONE m/8-byte bitmap per
partition (Arrow-batched ``mapInPandas``); above ``fanout`` partitions
the partials first collapse through one executor-side OR-merge level
behind a repartition stage boundary (build parallelism stays at P
tasks; the shuffle moves only P bitmap rows), then the final ≤fanout
bitmaps stream through the driver two-at-a-time via
``toLocalIterator``. Probe = the bitmap broadcast once, membership
tested in vectorized numpy — a scan-speed projection. No reference
counterpart (published-recipe operator).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# a large odd constant decorrelates h2 from h1 (both are xxhash64 of
# the value; the extra literal column changes the hash stream)
_H2_SALT = -1640531527


def bloom_parameters(n_items: int, fp_rate: float = 0.01) -> Tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_items`` at ``fp_rate``:
    m = -n ln p / (ln 2)^2 rounded up to a byte, k = (m/n) ln 2."""
    if n_items <= 0:
        return 64, 1
    m = int(math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _with_hashes(df: DataFrame, col: str) -> DataFrame:
    return df.select(
        F.xxhash64(F.col(col)).alias("_h1"),
        F.xxhash64(F.col(col), F.lit(_H2_SALT)).alias("_h2"),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    # uint64 wraparound keeps build and probe bit-identical
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((u1[:, None] + i * u2[:, None]) % np.uint64(m)).astype(np.int64)


def _tree_reduce_partials(parts: DataFrame, merge, schema: str, fanout: int) -> DataFrame:
    """Collapse one-row-per-partition partials executor-side until at
    most ``fanout`` rows remain. The boundary is a ``repartition`` —
    a real shuffle — NOT ``coalesce``: coalesce is narrow, so chained
    coalesce "levels" would propagate the final partition count back
    through the whole scan+build pipeline and collapse BUILD
    parallelism from P tasks to a handful (ADVICE r10). With the
    shuffle, build keeps all P tasks; the exchange moves P small
    bitmap rows (never data rows); each of the ``fanout`` merge tasks
    folds its ~P/fanout partials sequentially holding only two bitmaps
    at a time; the driver then folds the ≤fanout survivors."""
    n = parts.rdd.getNumPartitions()
    if n > fanout:
        parts = parts.repartition(fanout).mapInPandas(merge, schema=schema)
    return parts


def bloom_build(
    df: DataFrame, col: str, n_items: int, fp_rate: float = 0.01, fanout: int = 64
) -> Tuple[bytes, int, int]:
    """Build the filter over ``df[col]``; returns (bitmap, m_bits, k).

    ``n_items`` sizes the filter (pass the expected DISTINCT count; an
    upper bound only costs bits, an underestimate only costs false
    positives — never correctness). Above ``fanout`` input partitions
    the per-partition bitmaps OR-merge executor-side in tree levels
    before the driver fold, bounding driver transfers at ``fanout``
    bitmaps regardless of partition count."""
    m, k = bloom_parameters(n_items, fp_rate)

    def build_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(m // 8, dtype=np.uint8)
        for b in batches:
            if len(b) == 0:
                continue
            pos = _positions(b["_h1"].to_numpy(), b["_h2"].to_numpy(), m, k).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    def merge_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            for buf in b["bitmap"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                acc = arr.copy() if acc is None else acc | arr
        if acc is not None:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    parts = _with_hashes(df, col).mapInPandas(build_partition, schema="bitmap binary")
    parts = _tree_reduce_partials(parts, merge_partials, "bitmap binary", fanout)
    acc = np.zeros(m // 8, dtype=np.uint8)
    # stream the surviving bitmaps through the driver two-at-a-time; the
    # driver never holds more than 2 * m/8 bytes
    for row in parts.toLocalIterator():
        acc |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return acc.tobytes(), m, k


def bloom_contains(
    df: DataFrame, col: str, bitmap: bytes, m: int, k: int, out: str = "in_bloom"
) -> DataFrame:
    """Append boolean ``out``: is ``col`` (probably) in the filter?
    True for every value the filter was built over (no false
    negatives); false positives at the filter's design rate. The
    bitmap ships to executors once via a Spark broadcast."""
    bc = df.sparkSession.sparkContext.broadcast(bitmap)
    cols = df.columns
    schema = df.withColumn(out, F.lit(True)).schema

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for b in batches:
            if len(b) == 0:
                continue
            pos = _positions(b["_h1"].to_numpy(), b["_h2"].to_numpy(), m, k)
            hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            res = b.drop(columns=["_h1", "_h2"])
            res[out] = hit.all(axis=1)
            yield res

    with_h = df.withColumns(
        {
            "_h1": F.xxhash64(F.col(col)),
            "_h2": F.xxhash64(F.col(col), F.lit(_H2_SALT)),
        }
    )
    return with_h.mapInPandas(probe, schema=schema).select(*cols, out)


def bloom_dedup_against(df: DataFrame, col: str, bitmap: bytes, m: int, k: int) -> DataFrame:
    """Drop rows whose ``col`` is (probably) in the filter — the
    incremental-ingest shape: everything already seen goes, at the cost
    of the filter's false-positive rate in over-dropping (never
    under-dropping). A pure projection + filter: no shuffle."""
    return (
        bloom_contains(df, col, bitmap, m, k, out="_in_bloom")
        .where(~F.col("_in_bloom"))
        .drop("_in_bloom")
    )
