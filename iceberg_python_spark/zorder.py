"""Z-order (Morton-curve) clustering for multi-dimensional file pruning.

A table clustered on one column prunes filters on that column only; a
Z-order rewrite interleaves the bits of several columns' fixed-width
ranks into one sort key, so each output file covers a small hyper-cube
of the value space and min/max file stats stay tight on EVERY clustered
column at once. This is the `rewrite_data_files(strategy=sort,
sort_order=zorder(...))` maintenance action of Iceberg's Spark
procedures, absent from the reference (Python) implementation.

All expressions are Spark built-ins (casts, shifts, bitwise or) —
whole-stage codegen, no UDFs. Scaling bounds come from one aggregate
job (2·n scalars to the driver).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F, types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric/temporal column -> double, preserving order."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, _NUMERIC):
        return c.cast("double")
    raise ValueError(
        f"z-order supports numeric/date/timestamp columns; {col!r} is {dt.simpleString()}"
    )


def with_zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out: str = "_zkey"
) -> DataFrame:
    """Add a Morton-interleaved sort key over ``cols``.

    Each column is min/max-scaled to a ``bits``-wide integer rank (one
    aggregate job computes the bounds), then ranks are bit-interleaved:
    bit ``i`` of rank ``j`` lands at position ``i*len(cols)+j``. Nulls
    rank 0 (cluster together at the curve origin). ``bits*len(cols)``
    must fit a signed long."""
    cols = list(cols)
    if not cols:
        raise ValueError("z-order needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds a signed long")
    aggs = []
    for c in cols:
        # NaN-free bounds: Spark's min/max order NaN above every double,
        # so a single NaN row would poison mx (NaN), make the scale factor
        # NaN, and collapse every rank to one bucket with no error
        v = _as_double(df, c)
        aggs += [
            F.min(F.when(~F.isnan(v), v)).alias(f"_mn_{c}"),
            F.max(F.when(~F.isnan(v), v)).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    max_rank = (1 << bits) - 1
    ranks: List[Column] = []
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        v = _as_double(df, c)
        if mn is None or mx is None or mx == mn:
            ranks.append(F.lit(0).cast("long"))
        else:
            scaled = F.floor((v - F.lit(float(mn))) / F.lit(float(mx - mn)) * max_rank)
            rank = F.coalesce(F.least(F.greatest(scaled, F.lit(0)), F.lit(max_rank)), F.lit(0))
            # NaN sorts above all doubles, so NaN rows rank to the top
            # bucket — consistent with the sort order file stats will see
            ranks.append(F.when(F.isnan(v), F.lit(max_rank)).otherwise(rank).cast("long"))
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * len(ranks) + j))
    return df.withColumn(out, z)


def zorder_shape(
    df: DataFrame, cols: Sequence[str], n_files: int, bits: int = 16,
    extra_partition_cols: Sequence[Column] = (),
) -> DataFrame:
    """Range-partition ``df`` into ``n_files`` splits along the Z-curve
    and sort within each — every output file then covers one compact
    curve segment (a hyper-cube neighborhood of the value space)."""
    keyed = with_zorder_key(df, cols, bits)
    parts = [*extra_partition_cols, F.col("_zkey")]
    return (
        keyed.repartitionByRange(max(int(n_files), 1), *parts)
        .sortWithinPartitions(*parts)
        .drop("_zkey")
    )
