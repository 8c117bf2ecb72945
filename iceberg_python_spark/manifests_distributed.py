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


def avro_manifest_entries_df(spark, manifests, schema, spec):
    """Decode spec Avro manifests into the parquet-manifest row layout
    ON EXECUTORS (one task per manifest, ``mapInPandas``), so tables with
    ``write.metadata.format=avro`` — and spec-native tables written by
    other engines — plan distributed exactly like parquet-metadata
    tables instead of falling back to a driver-side Python loop. At
    100 TB a heavily-committed Avro table can carry thousands of
    manifests; this keeps plan time O(manifests / executors).

    Sequence-number / snapshot-id inheritance rides along as a JSON
    descriptor column (reference manifest.py:869-905 semantics applied
    by read_avro_manifest). The Schema/PartitionSpec are pickled into
    the closure like every other executor job in the engine."""
    import json as _json

    import pandas as pd

    rows = [
        (
            m["manifest_path"],
            _json.dumps(
                {
                    "sequence_number": m.get("sequence_number", 0),
                    "added_snapshot_id": m.get("added_snapshot_id"),
                }
            ),
        )
        for m in manifests
    ]
    out_ddl = (
        "status int, snapshot_id long, sequence_number long, content int, "
        "file_path string, file_format string, spec_id int, schema_id int, "
        "partition_json string, record_count long, file_size_in_bytes long, "
        "stats_json string"
    )

    def decode(batches):
        from .table.manifests import CONTENT_DATA, _partition_to_json, _stats_to_json, read_manifest

        cols = [
            "status", "snapshot_id", "sequence_number", "content", "file_path",
            "file_format", "spec_id", "schema_id", "partition_json",
            "record_count", "file_size_in_bytes", "stats_json",
        ]
        for pdf in batches:
            out = {c: [] for c in cols}
            for path, desc in zip(pdf["manifest_path"], pdf["descriptor"]):
                manifest = _json.loads(desc)
                for e in read_manifest(path, schema, spec, manifest=manifest):
                    d = e["data_file"]
                    out["status"].append(e["status"])
                    out["snapshot_id"].append(e["snapshot_id"])
                    out["sequence_number"].append(e["sequence_number"])
                    out["content"].append(d.get("content", CONTENT_DATA))
                    out["file_path"].append(d["file_path"])
                    out["file_format"].append(d.get("file_format", "PARQUET"))
                    out["spec_id"].append(d.get("spec_id", spec.spec_id))
                    out["schema_id"].append(d.get("schema_id", schema.schema_id))
                    out["partition_json"].append(_partition_to_json(d.get("partition", {}), spec, schema))
                    out["record_count"].append(d.get("record_count", 0))
                    out["file_size_in_bytes"].append(d.get("file_size_in_bytes", 0))
                    out["stats_json"].append(_stats_to_json(d, schema))
            yield pd.DataFrame(out)

    src = spark.createDataFrame(rows, "manifest_path: string, descriptor: string")
    return src.repartition(min(len(rows), 64)).mapInPandas(decode, out_ddl)
