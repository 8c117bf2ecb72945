"""The engine's mergeable-sketch family, minus Bloom membership
(``operators/bloom.py``): count-min FREQUENCY grids, HyperLogLog
DISTINCT-count tables, and t-digest QUANTILE tables.

Count-min (Cormode-Muthukrishnan, J. Algorithms 2005) answers "how
often does X occur?" and "what are the top items?" over a corpus too
large to groupBy-count exactly. Estimates NEVER undercount; they
overcount by at most ``eps * N`` (eps = e/width) with probability
1 - delta (delta = e^-depth), N = total items.

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


# ---------------------------------------------------------------------------
# t-digest: mergeable QUANTILE sketches as TABLES
# ---------------------------------------------------------------------------
# The fourth member of the sketch family (Bloom: membership, CMS:
# frequency, HLL: distinct count — t-digest: quantiles / rank). Spark's
# approx_percentile answers one query; a curation pipeline wants the
# DIGEST as a persistable row per (group, batch) — "p99 document length
# per source per crawl-day" is then a merge of day rows, never a
# rescan. Dunning & Ertl's merging t-digest (arXiv:1902.04023): sorted
# values fold into centroids whose width is capped by the k1 scale
# function k(q) = (delta/2pi)*asin(2q-1), so tails get tiny centroids
# (relative accuracy where quantiles matter) and the sketch is bounded
# at O(delta) centroids regardless of input size.
#
# Spark shape (100 TB): one partial digest per (input partition, group)
# via Arrow-batched mapInPandas — numpy sort + one linear compress pass
# over the partition's rows; only O(partitions * groups * delta)
# centroid rows shuffle to the per-group merge (concat + re-compress in
# applyInPandas). The corpus itself never reshuffles. Centroid order
# depends on partition layout, so merged digests are run-stable only in
# their GUARANTEES, not their exact centroids — oracle rows therefore
# claim rank error vs SQL-exact ranks, the published bound's shape.

_TD_DELTA_DEFAULT = 200  # ~1e-3 rank error at the median, better at tails

TDIGEST_FIELDS = (
    "sketch array<struct<mean:double,weight:long>>, "
    "td_n bigint, td_min double, td_max double"
)


def _td_k(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _td_compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """One merging pass over mean-sorted centroids: greedily absorb the
    next centroid while the union stays within one k-unit. Returns
    O(delta) centroids whose means are weight-averaged exactly."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = int(weights.sum())
    out_m: List[float] = []
    out_w: List[int] = []
    cur_m, cur_w = float(means[0]), int(weights[0])
    k_left = _td_k(np.array([0.0]), delta)[0]
    cum = 0  # weight fully to the left of the current centroid
    for m, w in zip(means[1:], weights[1:]):
        q_new = (cum + cur_w + int(w)) / total
        if _td_k(np.array([q_new]), delta)[0] - k_left <= 1.0:
            cur_m += (float(m) - cur_m) * (int(w) / (cur_w + int(w)))
            cur_w += int(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            k_left = _td_k(np.array([cum / total]), delta)[0]
            cur_m, cur_w = float(m), int(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m, dtype=np.float64), np.asarray(out_w, dtype=np.int64)


def _td_rows(
    means: np.ndarray, weights: np.ndarray, vmin: float, vmax: float
) -> dict:
    return {
        "sketch": [
            {"mean": float(m), "weight": int(w)} for m, w in zip(means, weights)
        ],
        "td_n": int(weights.sum()),
        "td_min": float(vmin),
        "td_max": float(vmax),
    }


def tdigest_build(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] = (),
    delta: float = _TD_DELTA_DEFAULT,
) -> DataFrame:
    """One digest row per group: ``(group..., sketch, td_n, td_min,
    td_max)``. NULL values are ignored. Builds a partial digest per
    (input partition, group), then merges per group — the corpus never
    reshuffles, only centroid rows do."""
    grp = list(group_cols)
    src = df.select(*grp, F.col(col).alias("_v")).where(F.col("_v").isNotNull())
    schema = ", ".join(
        f"`{c}` {src.schema[c].dataType.simpleString()}" for c in grp
    )
    schema = (schema + ", " if schema else "") + TDIGEST_FIELDS

    # canonical MergingDigest buffering: per group keep the running
    # O(delta) centroids plus a bounded value buffer; fold the buffer
    # into the centroids whenever it fills. Task memory is
    # O(groups * (delta + buffer)) — never O(partition rows) — at the
    # cost of a sort per fold instead of one per partition (repeated
    # re-compression is how the published structure works; the k1
    # size/accuracy invariant holds across folds).
    buf_cap = max(8192, 4 * int(delta))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # group -> [means, weights, buffered values, vmin, vmax]
        acc: dict = {}

        def fold(st: list) -> None:
            buf = np.concatenate(st[2])
            m = np.concatenate([st[0], buf])
            w = np.concatenate([st[1], np.ones(len(buf), dtype=np.int64)])
            st[0], st[1] = _td_compress(m, w, delta)
            st[2] = []
            st[3] = min(st[3], float(buf.min()))
            st[4] = max(st[4], float(buf.max()))

        for b in batches:
            if len(b) == 0:
                continue
            for keys, sub in (
                b.groupby(grp, dropna=False, sort=False) if grp else [((), b)]
            ):
                k = keys if isinstance(keys, tuple) else (keys,)
                st = acc.setdefault(
                    k,
                    [np.empty(0), np.empty(0, dtype=np.int64), [], np.inf, -np.inf],
                )
                st[2].append(sub["_v"].to_numpy(dtype=np.float64))
                if sum(len(c) for c in st[2]) >= buf_cap:
                    fold(st)
        rows = []
        for k, st in acc.items():
            if st[2]:
                fold(st)
            rows.append(dict(zip(grp, k)) | _td_rows(st[0], st[1], st[3], st[4]))
        if rows:
            yield pd.DataFrame(rows)

    parts = src.mapInPandas(partials, schema=schema)
    return tdigest_merge(parts, grp, delta)


def tdigest_build_pair(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    batch_col: str,
    delta: float = _TD_DELTA_DEFAULT,
) -> Tuple[DataFrame, DataFrame]:
    """(whole, merged) t-digests from ONE corpus pass: the per-group
    digest of the whole frame AND the merge of the per-(group,
    ``batch_col``) digests.

    Outputs are value-identical to running
    ``tdigest_build(df, col, group_cols, delta)`` and
    ``tdigest_merge(tdigest_build(df, col, [*group_cols, batch_col],
    delta).drop(batch_col), group_cols, delta)`` — both passes would
    consume the same source partitions and fold each key's value
    sequence through the same buffer/compress cadence — while the
    corpus crosses the Python boundary once instead of twice (guide
    §1.2/§4). The shared tagged-partials frame is materialized eagerly
    (two consumers)."""
    grp = list(group_cols)
    src = df.select(*grp, F.col(batch_col).alias("_b"), F.col(col).alias("_v")).where(
        F.col("_v").isNotNull()
    )
    buf_cap = max(8192, 4 * int(delta))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_w: dict = {}
        acc_p: dict = {}

        def fold(st: list) -> None:
            buf = np.concatenate(st[2])
            m = np.concatenate([st[0], buf])
            w = np.concatenate([st[1], np.ones(len(buf), dtype=np.int64)])
            st[0], st[1] = _td_compress(m, w, delta)
            st[2] = []
            st[3] = min(st[3], float(buf.min()))
            st[4] = max(st[4], float(buf.max()))

        def feed(acc, keys, sub) -> None:
            k = keys if isinstance(keys, tuple) else (keys,)
            st = acc.setdefault(
                k,
                [np.empty(0), np.empty(0, dtype=np.int64), [], np.inf, -np.inf],
            )
            st[2].append(sub["_v"].to_numpy(dtype=np.float64))
            if sum(len(c) for c in st[2]) >= buf_cap:
                fold(st)

        for b in batches:
            if len(b) == 0:
                continue
            for keys, sub in (
                b.groupby(grp, dropna=False, sort=False) if grp else [((), b)]
            ):
                feed(acc_w, keys, sub)
            for keys, sub in b.groupby([*grp, "_b"], dropna=False, sort=False):
                feed(acc_p, keys, sub)

        def emit(acc, key_cols, is_whole):
            rows = []
            for k, st in acc.items():
                if st[2]:
                    fold(st)
                row = dict(zip(key_cols, k))
                if is_whole:
                    row["_b"] = None
                rows.append(row | _td_rows(st[0], st[1], st[3], st[4]) | {"_w": is_whole})
            return rows

        rows = emit(acc_w, grp, True) + emit(acc_p, [*grp, "_b"], False)
        if rows:
            yield pd.DataFrame(rows, columns=[*grp, "_b", "sketch", "td_n", "td_min", "td_max", "_w"])

    schema_grp = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in grp)
    schema = (schema_grp + ", " if grp else "") + (
        f"_b {df.schema[batch_col].dataType.simpleString()}, " + TDIGEST_FIELDS + ", _w boolean"
    )
    partials = src.mapInPandas(partial, schema=schema).localCheckpoint(eager=True)
    whole = tdigest_merge(
        partials.where("_w").select(*grp, "sketch", "td_n", "td_min", "td_max"), grp, delta
    )
    parts = tdigest_merge(
        partials.where("NOT _w").select(*grp, "_b", "sketch", "td_n", "td_min", "td_max"),
        [*grp, "_b"],
        delta,
    ).drop("_b")
    return whole, tdigest_merge(parts, grp, delta)


def tdigest_merge(
    digests: DataFrame,
    group_cols: Sequence[str] = (),
    delta: float = _TD_DELTA_DEFAULT,
) -> DataFrame:
    """Merge digest rows (>= 1 per group, e.g. one per crawl batch)
    into one per group: concat centroids, re-compress. Input is sketch
    rows (tiny), never data."""
    grp = list(group_cols)
    schema = ", ".join(
        f"`{c}` {digests.schema[c].dataType.simpleString()}" for c in grp
    )
    schema = (schema + ", " if schema else "") + TDIGEST_FIELDS

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate(
            [np.array([c["mean"] for c in s], dtype=np.float64) for s in pdf["sketch"]]
        )
        weights = np.concatenate(
            [np.array([c["weight"] for c in s], dtype=np.int64) for s in pdf["sketch"]]
        )
        m, w = _td_compress(means, weights, delta)
        row = dict(zip(grp, [pdf[c].iloc[0] for c in grp])) | _td_rows(
            m, w, pdf["td_min"].min(), pdf["td_max"].max()
        )
        return pd.DataFrame([row])

    if grp:
        return digests.groupBy(*grp).applyInPandas(merge, schema=schema)
    return digests.repartition(1).mapInPandas(
        lambda it: iter([merge(pd.concat(list(it)))]), schema=schema
    )


def tdigest_quantiles(
    digests: DataFrame, qs: Sequence[float], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Append one row per (group, q): ``(group..., q, est)``. Linear
    interpolation between centroid midpoints with td_min/td_max as the
    rank-0 / rank-n anchors (singleton edge centroids are exact)."""
    grp = list(group_cols)
    qvals = [float(q) for q in qs]
    schema = ", ".join(
        f"`{c}` {digests.schema[c].dataType.simpleString()}" for c in grp
    )
    schema = (schema + ", " if schema else "") + "q double, est double"

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                m = np.array([c["mean"] for c in r["sketch"]], dtype=np.float64)
                w = np.array([c["weight"] for c in r["sketch"]], dtype=np.int64)
                n = int(w.sum())
                # midpoint ranks, anchored by min/max at ranks 0 and n
                mids = np.cumsum(w) - w / 2.0
                xs = np.concatenate([[0.0], mids, [float(n)]])
                ys = np.concatenate([[r["td_min"]], m, [r["td_max"]]])
                for q in qvals:
                    val = float(np.interp(q * n, xs, ys))
                    rows.append(dict(zip(grp, [r[c] for c in grp])) | {"q": q, "est": val})
            if rows:
                yield pd.DataFrame(rows)

    return digests.mapInPandas(est, schema=schema)


# ---------------------------------------------------------------------------
# theta / KMV: mergeable DISTINCT-COUNT sketches with SET ALGEBRA, and
# the wire format Iceberg statistics files actually store
# ---------------------------------------------------------------------------
# Fifth member of the sketch family (Bloom: membership, CMS: frequency,
# HLL: distinct count, t-digest: quantiles). Theta earns its slot next
# to HLL twice over:
#
# 1. SET ALGEBRA. An HLL register grid supports union only; a theta
#    sketch's retained-hash set supports union AND intersection /
#    difference estimates ("how many URLs did crawls A and B share?")
#    because the k smallest hashes of A ∪ B are a uniform sample of
#    the union — membership of each in A and B is exact.
# 2. WIRE PARITY. Iceberg's table-statistics Puffin blob
#    (`apache-datasketches-theta-v1`, reference
#    pyiceberg/table/statistics.py + the spec's Appendix) stores
#    exactly this: retained ordered 63-bit hashes + theta. A sketch
#    row built here serializes losslessly into the blob the reference
#    ecosystem reads (table/puffin.py: theta_sketch_bytes_from_hashes).
#
# Representation: `sketch array<long>` — the ≤ k smallest DISTINCT
# 63-bit hashes of the column's values, sorted ascending (KMV = the
# bottom-k variant of the theta family; fixed k makes union exact to
# implement and keeps every row ≤ 32 KiB at k=4096). Fewer than k
# retained hashes ⇒ the sketch is EXACT (every distinct hash is
# present); at k, the k-th smallest acts as theta and the unbiased
# estimate is (k-1) / (theta / 2^63).
#
# Scale shape: one mapInPandas pass emits ONE partial row (group,
# ≤ k hashes) per (partition × group) — the corpus never shuffles;
# the merge flattens partials per group with JVM array built-ins
# (flatten → array_distinct → array_sort → slice k). Build shuffle is
# O(partitions · groups · k) LONGS, merge of stored rows is
# O(rows · k), independent of data size.

_THETA_LG_K_DEFAULT = 12  # k = 4096 retained hashes, rse ≈ 1/sqrt(k-2) ≈ 1.6%
_THETA_SPACE = float(1 << 63)


def _theta_cut(grp_cols: Sequence[str], df: DataFrame, k: int) -> DataFrame:
    """(group..., hs array<long>) partial rows -> one KMV row per
    group: union the partial hash sets, keep the k smallest."""
    return df.groupBy(*grp_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("hs")))), 1, k
        ).alias("sketch")
    )


def theta_build(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] = (),
    lg_k: int = _THETA_LG_K_DEFAULT,
    pre_hashed: bool = False,
) -> DataFrame:
    """One KMV/theta sketch row per group: ``(group..., sketch)`` with
    ``sketch`` the sorted ≤ 2^lg_k smallest distinct 63-bit hashes.
    NULLs ignored (COUNT DISTINCT semantics). ``pre_hashed=True``
    means ``col`` already holds raw ``xxhash64`` longs (the one-pass
    multi-column melt in table statistics) — sketches stay
    bit-identical to the direct path."""
    k = 1 << lg_k
    grp = list(group_cols)
    raw = F.col(col) if pre_hashed else F.xxhash64(F.col(col))
    hashed = df.where(F.col(col).isNotNull()).select(
        *grp, F.shiftrightunsigned(raw, 1).alias("_h")
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for b in batches:
            if not len(b):
                continue
            for key, sub in b.groupby(list(grp) if grp else lambda _: 0)["_h"]:
                u = np.unique(sub.to_numpy(dtype=np.int64))
                prev = acc.get(key)
                merged = u if prev is None else np.union1d(prev, u)
                acc[key] = merged[:k]
        rows = []
        for key, hs in acc.items():
            key = key if isinstance(key, tuple) else (key,)
            row = dict(zip(grp, key)) if grp else {}
            row["hs"] = hs.tolist()
            rows.append(row)
        if rows:
            yield pd.DataFrame(rows, columns=[*grp, "hs"])

    schema_grp = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in grp)
    schema = (schema_grp + ", " if grp else "") + "hs array<long>"
    partials = hashed.mapInPandas(partial, schema=schema)
    return _theta_cut(grp, partials, k)


def theta_merge(
    sketches: DataFrame, group_cols: Sequence[str] = (), lg_k: int = _THETA_LG_K_DEFAULT
) -> DataFrame:
    """Merge sketch rows (≥1 per group, e.g. one per crawl batch) into
    one per group. Union of KMV sketches with a common k is EXACT:
    merge(sketch(A), sketch(B)) == sketch(A ∪ B), hash-for-hash."""
    grp = list(group_cols)
    return _theta_cut(grp, sketches.select(*grp, F.col("sketch").alias("hs")), 1 << lg_k)


def theta_estimate(
    sketches: DataFrame, group_cols: Sequence[str] = (), lg_k: int = _THETA_LG_K_DEFAULT
) -> DataFrame:
    """Append ``est_distinct`` (double): exact retained count below k,
    the unbiased KMV estimator (k-1)/(h_(k)/2^63) at k. A narrow
    projection — no shuffle, no Python."""
    k = 1 << lg_k
    n = F.size("sketch")
    theta = F.element_at("sketch", -1).cast("double") / F.lit(_THETA_SPACE)
    est = F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / theta)
    grp = list(group_cols)
    return sketches.select(*grp, "sketch", est.alias("est_distinct"))


def theta_intersect_estimate(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str] = (),
    lg_k: int = _THETA_LG_K_DEFAULT,
) -> DataFrame:
    """Per-group estimates over two sketch tables: ``est_a``,
    ``est_b``, ``est_union``, ``est_intersection`` (inclusion via the
    union sample: |A∩B| ≈ union_est · |sample∩both| / |sample|). The
    query HLL cannot answer. JVM array built-ins only."""
    grp = list(group_cols)
    k = 1 << lg_k
    j = a.select(*grp, F.col("sketch").alias("_sa")).join(
        b.select(*grp, F.col("sketch").alias("_sb")), grp
    ) if grp else a.select(F.col("sketch").alias("_sa")).crossJoin(
        b.select(F.col("sketch").alias("_sb"))
    )
    un = F.slice(F.array_sort(F.array_union("_sa", "_sb")), 1, k)
    j = j.select(*grp, "_sa", "_sb", un.alias("_su"))
    nu = F.size("_su")
    theta_u = F.element_at("_su", -1).cast("double") / F.lit(_THETA_SPACE)
    est_u = F.when(nu < k, nu.cast("double")).otherwise(F.lit(float(k - 1)) / theta_u)
    # below theta_u, membership of each union-sample hash in A and B
    # is exact — count hashes present in both
    both = F.size(F.array_intersect(F.array_intersect("_su", "_sa"), "_sb"))

    def _est(col):
        n = F.size(col)
        th = F.element_at(col, -1).cast("double") / F.lit(_THETA_SPACE)
        return F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / th)

    return j.select(
        *grp,
        _est("_sa").alias("est_a"),
        _est("_sb").alias("est_b"),
        est_u.alias("est_union"),
        (est_u * both.cast("double") / F.greatest(nu, F.lit(1)).cast("double")).alias(
            "est_intersection"
        ),
    )


# ---------------------------------------------------------------------------
# Misra-Gries: mergeable HEAVY-HITTER summaries with deterministic
# guarantees
# ---------------------------------------------------------------------------
# CMS + heavy_hitters() above answer frequency queries with
# PROBABILISTIC error; the Misra-Gries summary is the deterministic
# counterpart, and (Agarwal et al., "Mergeable Summaries", PODS'12)
# closed under merging — which makes it a TABLE row like the other
# sketches: one summary per (source, crawl-day), merged per month,
# never rescanning. Guarantees carried by every row and preserved by
# every merge, with `deducted` the summary's own error certificate:
#
#   est(x) <= true(x) <= est(x) + deducted      for every kept item
#   every x with true(x) > deducted is IN the summary
#   deducted <= n / (m + 1)
#
# Row shape: (group..., items array<struct<item, est>>, deducted, n).
# Scale shape: one partial summary per (partition × group) — a pandas
# value_counts compressed to m counters, so only O(partitions · groups
# · m) rows shuffle; the merge is pure JVM (sum counters, subtract the
# (m+1)-th largest, keep positives).

from pyspark.sql import Window as _W


def _mg_compress(summaries: DataFrame, group_cols: Sequence[str], m: int) -> DataFrame:
    """(group..., items, deducted, n) rows -> ONE row per group with
    the Misra-Gries merge: sum counters, subtract the (m+1)-th
    largest combined counter from every item, keep positive ones.

    The deduction ``_t`` rides the per-group ``t`` table (which always
    has a row — every input summary carries ≥1 item), NOT the kept
    rows: in the degenerate merge where every combined counter ties at
    the (m+1)-th value nothing is kept, and losing ``t`` there would
    under-state ``deducted`` and silently break the error certificate.
    A constant key stands in when ``group_cols`` is empty (a crossJoin
    against a possibly-empty frame would drop the global row)."""
    grp = list(group_cols)
    dummy = not grp
    if dummy:
        summaries = summaries.withColumn("_g", F.lit(1))
        grp = ["_g"]
    meta = summaries.groupBy(*grp).agg(
        F.sum("deducted").alias("_d"), F.sum("n").alias("n")
    )
    comb = (
        summaries.select(*grp, F.explode("items").alias("_it"))
        .groupBy(*grp, F.col("_it.item").alias("item"))
        .agg(F.sum("_it.est").alias("est"))
    )
    w = _W.partitionBy(*grp)
    rn = F.row_number().over(w.orderBy(F.desc("est"), F.asc("item")))
    comb = comb.withColumn("_rn", rn)
    t = comb.groupBy(*grp).agg(
        F.coalesce(F.max(F.when(F.col("_rn") == m + 1, F.col("est"))), F.lit(0)).alias("_t")
    )
    kept = comb.join(t, grp).where(F.col("est") > F.col("_t"))
    out = kept.groupBy(*grp).agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct((F.col("est") - F.col("_t")).alias("est"), F.col("item").alias("item"))
                )
            )
        ).alias("_raw")
    )
    items = F.transform("_raw", lambda s: F.struct(s["item"].alias("item"), s["est"].alias("est")))
    out = out.select(*grp, items.alias("items"))
    # left joins: a group whose input summaries are ALL empty-item rows
    # has no comb/t rows at all — it must still surface with its
    # accumulated deduction, not vanish
    joined = meta.join(t, grp, "left").join(out, grp, "left")
    res = joined.select(
        *grp,
        F.coalesce("items", F.array().cast("array<struct<item:string,est:long>>")).alias("items"),
        (F.col("_d") + F.coalesce("_t", F.lit(0))).alias("deducted"),
        "n",
    )
    return res.drop("_g") if dummy else res


def mg_build(
    df: DataFrame, col: str, group_cols: Sequence[str] = (), m: int = 64
) -> DataFrame:
    """One Misra-Gries summary row per group over ``col`` (cast to
    string; NULLs ignored). ``m`` counters ⇒ error ≤ n/(m+1)."""
    grp = list(group_cols)
    src = df.where(F.col(col).isNotNull()).select(
        *grp, F.col(col).cast("string").alias("_v")
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        nrows: dict = {}
        for b in batches:
            if not len(b):
                continue
            for key, sub in b.groupby(list(grp) if grp else lambda _: 0)["_v"]:
                vc = sub.value_counts()
                prev = acc.get(key)
                acc[key] = vc if prev is None else prev.add(vc, fill_value=0)
                nrows[key] = nrows.get(key, 0) + len(sub)
        rows = []
        for key, counts in acc.items():
            counts = counts.sort_values(ascending=False).astype("int64")
            if len(counts) > m:
                t = int(counts.iloc[m])  # the (m+1)-th largest
                counts = (counts.iloc[:m] - t)
                counts = counts[counts > 0]
            else:
                t = 0
            k = key if isinstance(key, tuple) else (key,)
            row = dict(zip(grp, k)) if grp else {}
            row["items"] = [
                {"item": str(i), "est": int(c)} for i, c in counts.items()
            ]
            row["deducted"] = t
            row["n"] = nrows[key]
            rows.append(row)
        if rows:
            yield pd.DataFrame(rows, columns=[*grp, "items", "deducted", "n"])

    schema_grp = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in grp)
    schema = (schema_grp + ", " if grp else "") + (
        "items array<struct<item:string,est:long>>, deducted long, n long"
    )
    partials = src.mapInPandas(partial, schema=schema)
    return _mg_compress(partials, grp, m)


def mg_merge(
    summaries: DataFrame, group_cols: Sequence[str] = (), m: int = 64
) -> DataFrame:
    """Merge summary rows (≥1 per group) into one per group; the
    deterministic guarantees above survive every merge."""
    return _mg_compress(summaries, list(group_cols), m)


def mg_build_pair(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    batch_col: str,
    m: int = 64,
) -> Tuple[DataFrame, DataFrame]:
    """(whole, merged) Misra-Gries summaries from ONE corpus pass: the
    per-group summary of the whole frame AND the merge of the
    per-(group, ``batch_col``) summaries.

    Outputs are value-identical to running
    ``mg_build(df, col, group_cols, m)`` and
    ``mg_merge(mg_build(df, col, [*group_cols, batch_col], m)
    .drop(batch_col), group_cols, m)`` — both passes would consume the
    same source partitions and fold each key's rows through the same
    accumulation — while the corpus crosses the Python boundary once
    instead of twice (guide §1.2/§4). The shared tagged-partials frame
    is materialized eagerly (two consumers); ``batch_col`` must be an
    existing column and must not be named like a group column."""
    grp = list(group_cols)
    src = df.where(F.col(col).isNotNull()).select(
        *grp, F.col(batch_col).alias("_b"), F.col(col).cast("string").alias("_v")
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_w: dict = {}
        n_w: dict = {}
        acc_p: dict = {}
        n_p: dict = {}
        for b in batches:
            if not len(b):
                continue
            for key, sub in b.groupby(list(grp) if grp else lambda _: 0)["_v"]:
                vc = sub.value_counts()
                prev = acc_w.get(key)
                acc_w[key] = vc if prev is None else prev.add(vc, fill_value=0)
                n_w[key] = n_w.get(key, 0) + len(sub)
            for key, sub in b.groupby([*grp, "_b"])["_v"]:
                vc = sub.value_counts()
                prev = acc_p.get(key)
                acc_p[key] = vc if prev is None else prev.add(vc, fill_value=0)
                n_p[key] = n_p.get(key, 0) + len(sub)

        def emit(acc, nrows, key_cols, is_whole):
            rows = []
            for key, counts in acc.items():
                counts = counts.sort_values(ascending=False).astype("int64")
                if len(counts) > m:
                    t = int(counts.iloc[m])  # the (m+1)-th largest
                    counts = (counts.iloc[:m] - t)
                    counts = counts[counts > 0]
                else:
                    t = 0
                k = key if isinstance(key, tuple) else (key,)
                row = dict(zip(key_cols, k))
                if is_whole:
                    row["_b"] = None
                row["items"] = [
                    {"item": str(i), "est": int(c)} for i, c in counts.items()
                ]
                row["deducted"] = t
                row["n"] = nrows[key]
                row["_w"] = is_whole
                rows.append(row)
            return rows

        rows = emit(acc_w, n_w, grp, True) + emit(acc_p, n_p, [*grp, "_b"], False)
        if rows:
            yield pd.DataFrame(rows, columns=[*grp, "_b", "items", "deducted", "n", "_w"])

    schema_grp = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in grp)
    schema = (schema_grp + ", " if grp else "") + (
        f"_b {df.schema[batch_col].dataType.simpleString()}, "
        "items array<struct<item:string,est:long>>, deducted long, n long, _w boolean"
    )
    partials = src.mapInPandas(partial, schema=schema).localCheckpoint(eager=True)
    whole = _mg_compress(
        partials.where("_w").select(*grp, "items", "deducted", "n"), grp, m
    )
    parts = _mg_compress(
        partials.where("NOT _w").select(*grp, "_b", "items", "deducted", "n"),
        [*grp, "_b"],
        m,
    ).drop("_b")
    return whole, _mg_compress(parts, grp, m)
