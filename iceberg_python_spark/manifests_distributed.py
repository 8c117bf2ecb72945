"""Helpers for distributed (Spark-side) manifest processing.

Partition tuples are stored in manifests as JSON of *internal*
representations (conversions.py); this maps an Iceberg type to the Spark
type that from_json should parse that internal value as.

``metrics_spark_predicate`` renders the inclusive metrics evaluation as
a Catalyst predicate over the manifest's ``stats_json`` column, so the
distributed planner prunes by file stats on EXECUTORS and collects only
surviving (path, seq, partition) rows — never the stats blobs. It is a
sound relaxation of the exact Python evaluator
(expressions/visitors.py:271): any predicate it cannot express JVM-side
evaluates to "keep", which only costs scan work (the residual filter
still applies at read), never correctness.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BooleanExpression,
    BoundPredicate,
    Not,
    Or,
)
from .types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    StringType,
    TimestamptzType,
    TimestampType,
    TimeType,
)

_INT_LIKE = (IntegerType, LongType, DateType, TimeType, TimestampType, TimestamptzType)


def json_storage_spark_type(t: IcebergType) -> T.DataType:
    if isinstance(t, _INT_LIKE):
        return T.LongType()
    if isinstance(t, (FloatType, DoubleType)):
        return T.DoubleType()
    if isinstance(t, BooleanType):
        return T.BooleanType()
    return T.StringType()


def _json_comparable(t: IcebergType) -> Optional[str]:
    """Spark cast target under which the JSON-stored internal form
    compares with the same order as the Python evaluator; None when no
    such cast exists (decimal/binary/uuid -> not expressible)."""
    if isinstance(t, _INT_LIKE):
        return "long"
    if isinstance(t, (FloatType, DoubleType)):
        return "double"
    if isinstance(t, StringType):
        return "string"
    return None


def metrics_spark_predicate(bound: BooleanExpression, stats_col: str = "stats_json") -> Column:
    """Inclusive-metrics 'file might match' as a Catalyst Column over the
    stats_json manifest column (necessary condition; see module doc)."""

    def stat(section: str, fid: int) -> Column:
        return F.get_json_object(F.col(stats_col), f"$.{section}.{fid}")

    def walk(e: BooleanExpression) -> Column:
        if isinstance(e, AlwaysTrue):
            return F.lit(True)
        if isinstance(e, AlwaysFalse):
            return F.lit(False)
        if isinstance(e, And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, Not):  # bind() rewrites Not away; keep-safe anyway
            return F.lit(True)
        if not isinstance(e, BoundPredicate):
            return F.lit(True)
        fid = e.field.field_id
        op = e.op
        if op == "is_null":
            nulls = stat("null_value_counts", fid).cast("long")
            return nulls.isNull() | (nulls > 0)
        if op == "not_null":
            vals = stat("value_counts", fid).cast("long")
            nulls = stat("null_value_counts", fid).cast("long")
            return ~(vals.isNotNull() & nulls.isNotNull() & (vals == nulls))
        cast_to = _json_comparable(e.field.field_type)
        if cast_to is None or op not in ("eq", "lt", "lt_eq", "gt", "gt_eq", "in"):
            return F.lit(True)  # not expressible -> keep
        lower = stat("lower_bounds", fid).cast(cast_to)
        upper = stat("upper_bounds", fid).cast(cast_to)
        # float bounds need a NaN keep-guard: the Python evaluator's
        # `NaN <op> v` comparisons are all False (file kept), but Spark
        # ORDERS NaN above every double, so an unguarded `lower < v`
        # would wrongly prune a NaN-bounded file. Guard = bound missing,
        # unparseable, or NaN -> keep (necessary-condition superset).
        is_float = isinstance(e.field.field_type, (FloatType, DoubleType))

        def guard(b: Column) -> Column:
            return (b.isNull() | F.isnan(b)) if is_float else b.isNull()

        def lit(v):
            return F.lit(v)

        if op == "eq":
            v = lit(e.value)
            return (guard(lower) | (lower <= v)) & (guard(upper) | (upper >= v))
        if op == "in":
            vmax = lit(max(e.values))
            vmin = lit(min(e.values))
            return (guard(lower) | (lower <= vmax)) & (guard(upper) | (upper >= vmin))
        if op == "lt":
            return guard(lower) | (lower < lit(e.value))
        if op == "lt_eq":
            return guard(lower) | (lower <= lit(e.value))
        if op == "gt":
            return guard(upper) | (upper > lit(e.value))
        if op == "gt_eq":
            return guard(upper) | (upper >= lit(e.value))
        return F.lit(True)

    return walk(bound) & (F.col("record_count") > 0)
