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


def _ts_num(df: DataFrame, col: str):
    """Epoch-µs long for timestamp columns — robust to TIMESTAMP_NTZ
    (parquet naive timestamps; ``unix_micros`` rejects NTZ, so diff
    against the NTZ epoch literal, timezone-independent) — and the
    column itself for numerics. A monotone sort/bucket/delta key."""
    t = df.schema[col].dataType
    if isinstance(t, T.TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)")
    if isinstance(t, T.TimestampType):
        return F.unix_micros(F.col(col))
    return F.col(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance: Optional[float] = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the LATEST right row with the
    same ``by`` keys and ``right.on <= left.on`` (``direction=
    "backward"``, the default; ``strict=True`` for ``<``), the EARLIEST
    right row at-or-after (``"forward"``), or whichever of the two is
    closer (``"nearest"``, ties to backward — two passes composed);
    unmatched left rows keep NULL right columns (left-join semantics,
    the standard as-of contract — pandas ``merge_asof`` directions).
    Forward/nearest need a timestamp or numeric ``on`` (they order on
    the negated axis).

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

    Keyless case (``by=()``): a single global window would funnel the
    whole union through ONE partition — instead the timeline is cut
    into occupancy-balanced chunks (``spark.sql.shuffle.partitions``
    × 4 quantile-sampled edges, so a dense time REGION spreads across
    chunks instead of landing in one), each chunk runs its own window,
    and the last right row of every chunk is carried across chunk
    edges via a tiny chunk-summary window (O(#chunks) rows,
    driver-free). A hot INSTANT — one timestamp quantile edges cannot
    split — additionally salts into hash sub-chunks whose carry rules
    preserve strict/inclusive visibility exactly (see
    ``_keyless_asof_carry``).
    """
    by = list(by)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"asof column {on!r} must exist on both sides")
    if direction == "nearest":
        return _asof_nearest(left, right, on, by, tolerance, strict)
    rpay = [c for c in right.columns if c != on and c not in by]
    collisions = (set(rpay) | {f"{on}_matched"}) & set(left.columns)
    if collisions:
        raise ValueError(f"right columns collide with left: {sorted(collisions)}; rename them first")
    lcols = [c for c in left.columns if c not in by]
    # tag order decides whether an exactly-equal right ts is visible to
    # the left row: right-before-left (0 < 1) = inclusive <=
    rtag, ltag = (1, 0) if strict else (0, 1)
    on_is_time = isinstance(
        left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    fwd = direction == "forward"
    if fwd and not (on_is_time or isinstance(left.schema[on].dataType, T.NumericType)):
        raise NotImplementedError("direction='forward' needs a timestamp or numeric asof column")

    def _ord(df_, col_):
        # forward = backward on the NEGATED axis: one code path serves
        # both directions (tolerance deltas negate consistently too)
        n = _ts_num(df_, col_)
        return (-n) if fwd else n

    # _ats / _tsu carry the ORDER key as epoch-µs longs (timestamps) or
    # the raw value (numerics); _m._ts keeps the original type for the
    # {on}_matched output column
    tsu_type = T.LongType() if on_is_time else right.schema[on].dataType
    rp_type = T.StructType(
        [T.StructField("_ts", right.schema[on].dataType), T.StructField("_tsu", tsu_type)]
        + [T.StructField(c, right.schema[c].dataType) for c in rpay]
    )
    lpart = left.select(
        *[F.col(c) for c in by],
        _ord(left, on).alias("_ats"),
        F.lit(ltag).alias("_tag"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    rpart = right.select(
        *[F.col(c) for c in by],
        _ord(right, on).alias("_ats"),
        F.lit(rtag).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.struct(
            F.col(on).alias("_ts"), _ord(right, on).alias("_tsu"), *[F.col(c) for c in rpay]
        ).alias("_rp"),
    )
    from pyspark.sql import Window

    u = lpart.unionByName(rpart)
    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy("_ats", "_tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    else:
        u = _keyless_asof_carry(u, strict)
    out = u.where(F.col("_tag") == ltag)
    valid = F.col("_m").isNotNull()
    if tolerance is not None:
        if on_is_time:
            delta = (F.col("_ats") - F.col("_m._tsu")) / F.lit(1_000_000.0)
        else:
            delta = F.col("_ats") - F.col("_m._tsu")
        valid = valid & (delta <= F.lit(tolerance))
    sel = []
    for c in left.columns:
        sel.append(F.col(c) if c in by else F.col(f"_l_{c}").alias(c))
    sel.append(F.when(valid, F.col("_m._ts")).alias(f"{on}_matched"))
    for c in rpay:
        sel.append(F.when(valid, F.col(f"_m.{c}")).alias(c))
    return out.select(*sel)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    tolerance: Optional[float],
    strict: bool,
) -> DataFrame:
    """direction='nearest': compose the backward and forward passes and
    pick the closer match per left row (ties to backward). Costs two
    as-of shuffles; the left side is id-tagged and checkpointed once so
    both passes see identical row identities."""
    t = left.schema[on].dataType
    if not isinstance(t, (T.TimestampType, T.TimestampNTZType, T.NumericType)):
        raise NotImplementedError("direction='nearest' needs a timestamp or numeric asof column")
    lid = "_asof_lid"
    if lid in left.columns or lid in right.columns:
        raise ValueError(f"column {lid!r} is reserved by direction='nearest'")
    left_id = left.withColumn(lid, F.monotonically_increasing_id()).localCheckpoint(eager=True)
    b = asof_join(left_id, right, on, by, tolerance, strict, direction="backward")
    f = asof_join(left_id, right, on, by, tolerance, strict, direction="forward")
    rpay = [c for c in right.columns if c != on and c not in by]
    mcols = [f"{on}_matched", *rpay]
    fsel = f.select(F.col(lid), *[F.col(c).alias(f"_f_{c}") for c in mcols])

    def num(c):
        if isinstance(t, T.TimestampNTZType):
            return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{c}`)")
        if isinstance(t, T.TimestampType):
            return F.unix_micros(F.col(c))
        return F.col(c)

    j = b.join(fsel, lid)
    db = num(on) - num(f"{on}_matched")
    df_ = num(f"_f_{on}_matched") - num(on)
    use_fwd = F.col(f"{on}_matched").isNull() | (
        F.col(f"_f_{on}_matched").isNotNull() & (df_ < db)
    )
    sel = [F.col(c) for c in left.columns]
    for c in mcols:
        sel.append(F.when(use_fwd, F.col(f"_f_{c}")).otherwise(F.col(c)).alias(c))
    return j.select(*sel)


def _keyless_asof_carry(
    u: DataFrame, strict: bool = False, keep_chunk_col: bool = False
) -> DataFrame:
    """Running-last for the keyless as-of WITHOUT a global one-partition
    window: cut the timeline into OCCUPANCY-balanced chunks (sampled
    quantile edges — VERDICT r10 #5: equal-width chunks concentrate a
    time hotspot in one chunk; quantile edges spread ~equal row counts
    per chunk no matter how skewed the instants), window inside each
    chunk, then carry every chunk's last right struct across edges via
    an O(#chunks) summary window. Costs one extra approxQuantile job to
    place the edges (bounded driver state: O(n_chunks) doubles).

    Hot INSTANTS (a single timestamp holding many rows — quantile edges
    cannot split equal values) get salted sub-chunks: each hot value v
    becomes its own [v, nextafter(v)) bucket whose LEFT rows hash-spread
    over m sub-chunks; its RIGHT rows go to sub-chunk 0 when inclusive
    (in-window for sub 0, carried to sub 1..m-1 — every left at v sees
    them) or to a dedicated TRAILING sub-chunk when strict (no left
    sub-chunk of v precedes it, so no left at v ever sees a right at v;
    later chunks still receive it as carry). Sub-chunk ids stay
    monotone in time, which is all the carry window needs.

    Order-key routing matches the keyed path's nulls-first window
    ordering (ADVICE r10): a NULL order key goes to chunk 0 — it sorts
    before every finite row there, sees no carry, and matches exactly
    what the keyed window would hand it (nothing, unless null-ts right
    rows exist); a NaN key (Spark orders NaN greatest) is pinned after
    the last finite chunk."""
    import math as _math
    from collections import Counter

    from pyspark.sql import Window

    # asof_join already normalized _ats to a numeric order key
    num = F.col("_ats").cast("double")
    spark = u.sparkSession
    n_chunks = max(1, int(str(spark.conf.get("spark.sql.shuffle.partitions", "200"))) * 4)
    finite = u.select(num.alias("_q")).where(F.col("_q").isNotNull() & ~F.isnan("_q"))
    probs = [i / n_chunks for i in range(1, n_chunks)]
    rel_err = 1.0 / (4 * n_chunks) if n_chunks > 1 else 0.25
    qs = finite.approxQuantile("_q", probs, rel_err)
    cnt = Counter(float(q) for q in qs)
    # a value spanning >=2 quantile marks holds >~ 1/n_chunks of all
    # rows — worth salting; cap the hot list to bound expression size
    hot = dict(
        sorted(((v, m) for v, m in cnt.items() if m >= 2), key=lambda kv: -kv[1])[:64]
    )
    split_set = set(cnt)
    for v in hot:
        split_set.add(_math.nextafter(v, _math.inf))  # isolate v in [v, next(v))
    splits = [float("-inf")] + sorted(split_set) + [float("inf")]
    n_base = len(splits) - 1  # Bucketizer bucket count
    # sub-chunk stride: lefts use [0, m), strict rights use m
    stride = (max(hot.values()) + 1) if hot else 1
    if n_base == 1:
        base = F.lit(0).cast("long")
    else:
        # Bucketizer = JVM-side binary search over the sorted edges
        # (O(log n_chunks) per row; a filter() higher-order scan would
        # be O(n_chunks)); handleInvalid is moot — NaN/null are routed
        # by the expressions below, never by the bucketizer
        from pyspark.ml.feature import Bucketizer

        b = Bucketizer(
            splits=splits, inputCol="_q_asof", outputCol="_bk_asof", handleInvalid="keep"
        )
        u = b.transform(u.withColumn("_q_asof", F.nanvl(num, F.lit(None).cast("double"))))
        base = F.col("_bk_asof").cast("long")
    sub = F.lit(0).cast("long")
    if hot:
        bucket_of = {v: splits.index(v) for v in hot}
        is_right = F.col("_rp").isNotNull()
        # per-row spread for the salt: hash the atomic left columns
        # (maps/arrays can refuse xxhash64) + a row id for identical
        # rows. The final match is INVARIANT to which sub-chunk a left
        # row lands in (see carry rules above), so the row id's
        # recompute nondeterminism cannot change results.
        atomic = [
            c
            for c in u.columns
            if c not in ("_rp", "_q_asof", "_bk_asof")
            and isinstance(u.schema[c].dataType, T.AtomicType)
        ]
        lhash = F.xxhash64(*atomic, F.monotonically_increasing_id())
        for v, m in hot.items():
            sub = F.when(
                base == F.lit(bucket_of[v]),
                F.when(is_right, F.lit(m if strict else 0)).otherwise(
                    F.pmod(lhash, F.lit(m))
                ),
            ).otherwise(sub)
    chunk = (base * F.lit(stride) + sub).cast("long")
    chunk = (
        F.when(F.col("_ats").isNull(), F.lit(0).cast("long"))
        .when(F.isnan(num), F.lit(n_base * stride).cast("long"))
        .otherwise(chunk)
    )
    uc = u.withColumn("_chunk", chunk).drop("_q_asof", "_bk_asof")
    w_in = (
        Window.partitionBy("_chunk")
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    uc = uc.withColumn("_m0", F.last("_rp", ignorenulls=True).over(w_in))
    last_rt = (
        uc.where(F.col("_rp").isNotNull())
        .groupBy("_chunk")
        .agg(F.max_by("_rp", F.struct(F.col("_ats"), F.col("_tag"))).alias("_last_rp"))
    )
    # full chunk frame so chunks with no right rows still receive a
    # carry; the summary window is <= n_chunks rows (single partition by
    # construction, bounded)
    carry = (
        uc.select("_chunk")
        .distinct()
        .join(last_rt, "_chunk", "left")
        .withColumn(
            "_carry",
            F.last("_last_rp", ignorenulls=True).over(
                Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("_chunk", "_carry")
    )
    out = uc.join(F.broadcast(carry), "_chunk").withColumn(
        "_m", F.coalesce(F.col("_m0"), F.col("_carry"))
    )
    # keep_chunk_col: tests introspect the chunk balance (hot-instant salting)
    return out.drop("_m0", "_carry") if keep_chunk_col else out.drop("_chunk", "_m0", "_carry")


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

    def _is_ts(col, side):
        return isinstance(side.schema[col].dataType, (T.TimestampType, T.TimestampNTZType))

    all_ts = _is_ts(ts_col, left) and _is_ts(start_col, right) and _is_ts(end_col, right)
    if all_ts:
        # pure-int64 bucket math in epoch micros: pmod-floor never
        # suffers the double-rounding edge flip, and floor((end-1)/w)
        # IS the last covered bucket of a half-open interval
        w = int(round(float(bucket_width) * 1_000_000))

        def _fdiv(c):
            return ((c - F.pmod(c, F.lit(w))) / F.lit(w)).cast("long")

        lb = _fdiv(_ts_num(left, ts_col))
        rs_b = _fdiv(_ts_num(right, start_col))
        re_b = _fdiv(_ts_num(right, end_col) - F.lit(1))
        buckets = F.sequence(rs_b, F.greatest(re_b, rs_b))
    else:
        # numeric axis: double bucket math (point and interval edges go
        # through the SAME expression, so bucket indices stay consistent)
        def to_num(col):
            return F.col(col).cast("double")

        lb = F.floor(to_num(ts_col) / F.lit(float(bucket_width)))
        rs = to_num(start_col)
        re_ = to_num(end_col)
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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
    hot_keys: Optional[Sequence] = None,
) -> DataFrame:
    """Skew-safe equi-join: identical RESULT to ``left.join(right, on,
    how)`` (the driver row value-hashes that equality), different
    PHYSICAL shape — a hot key's rows split across ``salt`` shuffle
    partitions instead of landing in one straggler task.

    Mechanics: each left row gets a deterministic salt (``xxhash64``
    of the whole row, mod ``salt`` — content-derived, so reruns and
    retries salt identically); the right side replicates ``salt``
    times via one generated ``explode(sequence)``; the join keys on
    ``(on..., salt)``. With ``hot_keys`` given, ONLY those keys
    replicate (everything else joins at salt 0), so the right-side
    blow-up is |hot set| · salt rows, not |right| · salt.

    When to reach for this instead of AQE's skew-join split: AQE can
    only split a skewed partition AFTER a shuffle materializes it and
    cannot split a single key's rows across tasks for a hash join it
    chose to broadcast-bucket differently; salting moves the split to
    plan time and composes with any downstream groupBy on the same
    keys. ``how`` supports inner/left — the salt column is an equal
    partner in the key, so every left row (salted exactly once)
    preserves outer semantics; right/full outer would duplicate
    right-side no-match rows per salt replica and are refused.
    """
    keys = list(on)
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full outer would duplicate unmatched right rows per replica)"
        )
    if salt < 2:
        raise ValueError(f"salt must be >= 2 to split anything, got {salt}")
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join reserves the column name '_salt'; rename it first")
    lsalt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(salt))
    if hot_keys is not None:
        if len(keys) != 1:
            raise ValueError("hot_keys currently targets single-column join keys")
        hot = [k for k in hot_keys]
        lsalt = F.when(F.col(keys[0]).isin(hot), lsalt).otherwise(F.lit(0))
        rsalts = F.when(
            F.col(keys[0]).isin(hot), F.sequence(F.lit(0), F.lit(salt - 1))
        ).otherwise(F.array(F.lit(0)))
    else:
        rsalts = F.sequence(F.lit(0), F.lit(salt - 1))
    lt = left.withColumn("_salt", lsalt.cast("int"))
    rt = right.withColumn("_salt", F.explode(rsalts)).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    out = lt.join(rt, [*keys, "_salt"], how)
    return out.drop("_salt")
