"""Temporal join operators Spark lacks natively.

Spark plans an inequality join (``l.ts >= r.ts``) as a broadcast
nested loop — O(|L|·|R|) and driver-bounded. These operators express
the two standard temporal joins as compositions of equi-shuffles and
windows, the shapes that scale:

- ``asof_join``      — union + per-key window carry-forward: ONE
                       shuffle on the key, per-key state bounded by the
                       window frame (a running last value).
- ``range_interval_join`` — time-bucket equi-join: intervals explode to
                       the buckets they cover, points join their single
                       bucket, the exact predicate filters after.

No reference counterpart (pyiceberg has no joins at all — SURVEY §2
marks the join family as Spark-native; these two are the members Spark
does NOT provide as scalable plans).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance: Optional[float] = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row
    with the same ``by`` keys and ``right.on <= left.on`` (``strict=True``
    for ``<``); unmatched left rows keep NULL right columns (left-join
    semantics, the standard as-of contract).

    ``tolerance`` (same units as ``on`` — seconds for timestamps)
    rejects matches older than ``left.on - tolerance``: the right
    payload nulls out, the left row survives.

    Shape: the two inputs are UNIONED with a tag and one window per
    ``by`` key carries the last right-row STRUCT forward — one shuffle
    keyed on ``by``, ordered by (ts, tag), running-last state O(1) per
    row. This beats the naive inequality join (broadcast nested loop,
    O(|L|·|R|)) at any scale; per-key ordering cost is the same sort a
    merge join would need. The right payload rides in ONE struct so a
    legitimately-NULL right column can never leak a value from an older
    right row (the column-wise ``last(ignorenulls)`` bug).

    Ties: right rows sharing an exact (key, ts) are resolved by the
    LAST one in the window's (deterministic only if such duplicates are
    pre-deduped — as-of joins conventionally require unique right
    timestamps per key; dedupe upstream for reproducible output).

    Returns the left columns (original order) + each right payload
    column under its own name + ``{on}_matched`` (the matched right
    timestamp). Raises on column-name collisions.
    """
    by = list(by)
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"asof column {on!r} must exist on both sides")
    rpay = [c for c in right.columns if c != on and c not in by]
    collisions = (set(rpay) | {f"{on}_matched"}) & set(left.columns)
    if collisions:
        raise ValueError(f"right columns collide with left: {sorted(collisions)}; rename them first")
    lcols = [c for c in left.columns if c not in by]
    # tag order decides whether an exactly-equal right ts is visible to
    # the left row: right-before-left (0 < 1) = inclusive <=
    rtag, ltag = (1, 0) if strict else (0, 1)
    rp_type = T.StructType(
        [T.StructField("_ts", right.schema[on].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in rpay]
    )
    lpart = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ats"),
        F.lit(ltag).alias("_tag"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    rpart = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ats"),
        F.lit(rtag).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.struct(F.col(on).alias("_ts"), *[F.col(c) for c in rpay]).alias("_rp"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*by)
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lpart.unionByName(rpart).withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = u.where(F.col("_tag") == ltag)
    valid = F.col("_m").isNotNull()
    if tolerance is not None:
        ts_type = left.schema[on].dataType
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            delta = (
                F.unix_micros(F.col("_ats")) - F.unix_micros(F.col("_m._ts"))
            ) / F.lit(1_000_000.0)
        else:
            delta = F.col("_ats") - F.col("_m._ts")
        valid = valid & (delta <= F.lit(tolerance))
    sel = []
    for c in left.columns:
        sel.append(F.col(c) if c in by else F.col(f"_l_{c}").alias(c))
    sel.append(F.when(valid, F.col("_m._ts")).alias(f"{on}_matched"))
    for c in rpay:
        sel.append(F.when(valid, F.col(f"_m.{c}")).alias(c))
    return out.select(*sel)


def range_interval_join(
    left: DataFrame,
    ts_col: str,
    right: DataFrame,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Inner join of points to half-open intervals
    (``start <= ts < end``, plus optional ``by`` key equality) WITHOUT
    the broadcast-nested-loop plan Spark gives a raw inequality join.

    Shape: time is cut into ``bucket_width``-sized buckets (seconds for
    timestamps, plain units for numerics). Each interval EXPLODES to
    the buckets it covers; each point joins its single containing
    bucket — an equi-join on (bucket, *by) — and the exact range
    predicate filters after. A (point, interval) pair can meet in only
    one bucket, so no distinct pass is needed.

    At scale: shuffle keys are (bucket, by) — time-uniform data spreads
    evenly; a hot bucket is a genuine data hotspot and AQE skew-split
    applies. Cost is linear in points + sum(interval length / width):
    pick ``bucket_width`` near the typical interval length so most
    intervals explode to 1-2 buckets.

    Returns left columns + right columns (collision-checked).
    """
    by = list(by)
    collisions = set(right.columns) & set(left.columns) - set(by)
    if collisions:
        raise ValueError(f"overlapping columns {sorted(collisions)}; rename them first")

    def to_num(col, side):
        t = side.schema[col].dataType
        if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(F.col(col)) / F.lit(1_000_000.0)
        return F.col(col).cast("double")

    lb = F.floor(to_num(ts_col, left) / F.lit(float(bucket_width)))
    rs = to_num(start_col, right)
    re_ = to_num(end_col, right)
    # half-open end: an interval ending exactly on a bucket edge does
    # not cover that bucket
    buckets = F.sequence(
        F.floor(rs / F.lit(float(bucket_width))).cast("long"),
        F.greatest(
            F.ceil(re_ / F.lit(float(bucket_width))).cast("long") - F.lit(1),
            F.floor(rs / F.lit(float(bucket_width))).cast("long"),
        ),
    )
    lt = left.withColumn("_b", lb.cast("long"))
    rt = right.withColumn("_b", F.explode(buckets))
    cond = [lt["_b"] == rt["_b"]] + [lt[c] == rt[c] for c in by]
    joined = lt.join(rt, cond, "inner").where(
        (rt[start_col] <= lt[ts_col]) & (lt[ts_col] < rt[end_col])
    )
    sel = [lt[c] for c in left.columns] + [rt[c] for c in right.columns if c not in by]
    return joined.select(*sel)
