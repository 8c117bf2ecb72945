"""Partition specs — Iceberg hidden partitioning on Spark.

Reference: pyiceberg/partitioning.py (PartitionSpec/PartitionField) and
the inclusive/strict projection visitors (expressions/visitors.py:799-860,
:1477-1500). A spec maps table columns through transforms to partition
fields; the scan planner projects row filters into partition space to
prune manifests and files, and the writer fans data out by the same
transform expressions (io/pyarrow.py:3053 _determine_partitions analogue,
executed as Spark ``repartition`` + ``partitionBy``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BooleanExpression,
    BoundPredicate,
    Not,
    Or,
    rewrite_not,
)
from .schema import Schema
from .transforms import IdentityTransform, Transform, parse_transform
from .types import NestedField

PARTITION_FIELD_ID_START = 1000


@dataclass(frozen=True)
class PartitionField:
    source_id: int
    field_id: int
    transform: Transform
    name: str

    def to_dict(self) -> Dict[str, Any]:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "transform": self.transform.name,
            "name": self.name,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PartitionField":
        return cls(d["source-id"], d["field-id"], parse_transform(d["transform"]), d["name"])


class PartitionSpec:
    def __init__(self, *fields: PartitionField, spec_id: int = 0):
        self.fields: Tuple[PartitionField, ...] = tuple(fields)
        self.spec_id = spec_id

    @property
    def is_unpartitioned(self) -> bool:
        return len(self.fields) == 0

    def fields_by_source_id(self, source_id: int) -> List[PartitionField]:
        return [f for f in self.fields if f.source_id == source_id]

    def field_names(self) -> List[str]:
        return [f.name for f in self.fields]

    def to_dict(self) -> Dict[str, Any]:
        return {"spec-id": self.spec_id, "fields": [f.to_dict() for f in self.fields]}

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PartitionSpec":
        return cls(*[PartitionField.from_dict(f) for f in d["fields"]], spec_id=d["spec-id"])

    def __eq__(self, o: object) -> bool:
        return isinstance(o, PartitionSpec) and self.fields == o.fields

    def __repr__(self) -> str:
        return f"PartitionSpec(spec_id={self.spec_id}, fields={list(self.fields)})"

    # -- schema of the partition tuple -------------------------------------
    def partition_schema(self, table_schema: Schema) -> Schema:
        fields = []
        for pf in self.fields:
            src = table_schema.find_field(pf.source_id)
            fields.append(NestedField(pf.field_id, pf.name, pf.transform.result_type(src.field_type), required=False))
        return Schema(*fields)

    def partition_to_path(self, partition: Mapping[str, Any], table_schema: Schema) -> str:
        """Hive-style ``name=value/...`` path for a partition tuple
        (reference partitioning.py:238 partition_to_path): values render
        through the transform's human string (calendar forms for temporal
        transforms) and both sides are URL-quoted with no safe chars."""
        from urllib.parse import quote_plus

        segs = []
        for pf in self.fields:
            try:
                src_type = table_schema.find_field(pf.source_id).field_type
                result_type = pf.transform.result_type(src_type)
            except ValueError:
                # dropped source column: the reference renders through
                # UnknownType — plain str form is the best we can do
                result_type = None
            human = pf.transform.to_human_string(result_type, partition.get(pf.name))
            segs.append(f"{quote_plus(pf.name, safe='')}={quote_plus(human, safe='')}")
        return "/".join(segs)

    # -- write-side fan-out columns -----------------------------------------
    def spark_partition_columns(self, table_schema: Schema) -> List[Tuple[str, Column]]:
        out = []
        for pf in self.fields:
            src = table_schema.find_field(pf.source_id)
            out.append((pf.name, pf.transform.spark_expr(F.col(src.name), src.field_type)))
        return out

    # -- filter projection into partition space ------------------------------
    def inclusive_projection(self, table_schema: Schema, bound_expr: BooleanExpression) -> BooleanExpression:
        """Row filter -> partition filter such that partition-match is
        NECESSARY for any row match (reference InclusiveProjection)."""
        from .expressions import bind

        part_schema = self.partition_schema(table_schema)

        def go(e: BooleanExpression) -> BooleanExpression:
            if isinstance(e, (AlwaysTrue, AlwaysFalse)):
                return e
            if isinstance(e, And):
                return And(go(e.left), go(e.right))
            if isinstance(e, Or):
                return Or(go(e.left), go(e.right))
            assert isinstance(e, BoundPredicate), f"must be bound: {e!r}"
            result: BooleanExpression = AlwaysTrue()
            for part in self.fields_by_source_id(e.field.field_id):
                projected = part.transform.project(part.name, e)
                if projected is not None:
                    result = And(result, bind(projected, part_schema))
            return result

        return go(rewrite_not(bound_expr))

    def strict_projection(self, table_schema: Schema, bound_expr: BooleanExpression) -> BooleanExpression:
        """Row filter -> partition filter such that partition-match
        GUARANTEES every row matches (reference StrictProjection)."""
        from .expressions import bind

        part_schema = self.partition_schema(table_schema)

        def go(e: BooleanExpression) -> BooleanExpression:
            if isinstance(e, (AlwaysTrue, AlwaysFalse)):
                return e
            if isinstance(e, And):
                return And(go(e.left), go(e.right))
            if isinstance(e, Or):
                return Or(go(e.left), go(e.right))
            assert isinstance(e, BoundPredicate), f"must be bound: {e!r}"
            result: BooleanExpression = AlwaysFalse()
            for part in self.fields_by_source_id(e.field.field_id):
                projected = part.transform.strict_project(part.name, e)
                if projected is not None:
                    result = Or(result, bind(projected, part_schema))
            return result

        return go(rewrite_not(bound_expr))


UNPARTITIONED = PartitionSpec(spec_id=0)


def spec_from_names(
    table_schema: Schema, *parts: Any, spec_id: int = 0
) -> PartitionSpec:
    """Convenience builder: each part is either a column name (identity) or
    a ``(column, transform_string)`` / ``(column, transform_string, name)``
    tuple, e.g. ``("l_shipdate", "month")`` or ``("id", "bucket[16]")``."""
    fields = []
    next_id = PARTITION_FIELD_ID_START
    for p in parts:
        if isinstance(p, str):
            col, tf, name = p, IdentityTransform(), p
        else:
            col = p[0]
            tf = parse_transform(p[1])
            name = p[2] if len(p) > 2 else f"{col}_{p[1].split('[')[0]}"
            if isinstance(tf, IdentityTransform):
                name = p[2] if len(p) > 2 else col
        src = table_schema.find_field(col)
        fields.append(PartitionField(src.field_id, next_id, tf, name))
        next_id += 1
    return PartitionSpec(*fields, spec_id=spec_id)
