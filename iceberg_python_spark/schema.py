"""Field-ID based schema (reference: pyiceberg/schema.py:82 `class Schema`).

The schema is the bridge between the metadata plane (field IDs, used by
manifests/stats/partition specs) and the data plane (Spark StructType,
name-based). Conversions keep IDs in ``StructField.metadata`` and Spark
writes them to parquet as ``parquet.field.id``.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterable, List, Optional, Set, Tuple

from pyspark.sql import types as T

from .types import (
    FIELD_ID_KEY,
    BinaryType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IcebergType,
    IntegerType,
    ListType,
    LongType,
    MapType,
    NestedField,
    StringType,
    StructType,
    TimestamptzType,
    TimestampType,
    _to_spark_field,
    from_spark_type,
    to_spark_type,
    type_from_dict,
    type_to_dict,
)


class Schema:
    """An ordered collection of top-level NestedFields plus indexes.

    Reference parity: pyiceberg/schema.py:82 (Schema), :851 (accessors),
    :1492 (prune_columns), :1647 (promote).
    """

    def __init__(
        self,
        *fields: NestedField,
        schema_id: int = 0,
        identifier_field_ids: Optional[List[int]] = None,
    ):
        self.fields: Tuple[NestedField, ...] = tuple(fields)
        self.schema_id = schema_id
        self.identifier_field_ids: List[int] = identifier_field_ids or []
        self._id_to_field: Dict[int, NestedField] = {}
        self._name_to_id: Dict[str, int] = {}
        self._id_to_name: Dict[int, str] = {}
        self._index(self.fields, prefix="")

    def _index(self, fields: Iterable[NestedField], prefix: str) -> None:
        for f in fields:
            full = f"{prefix}{f.name}"
            self._id_to_field[f.field_id] = f
            self._name_to_id[full] = f.field_id
            self._name_to_id.setdefault(full.lower(), f.field_id)
            self._id_to_name[f.field_id] = full
            t = f.field_type
            if isinstance(t, StructType):
                self._index(t.fields, prefix=f"{full}.")
            elif isinstance(t, ListType):
                self._index([t.element_field], prefix=f"{full}.")
            elif isinstance(t, MapType):
                self._index([t.key_field, t.value_field], prefix=f"{full}.")

    # -- lookups ----------------------------------------------------------
    def find_field(self, name_or_id, case_sensitive: bool = True) -> NestedField:
        if isinstance(name_or_id, int):
            f = self._id_to_field.get(name_or_id)
            if f is None:
                raise ValueError(f"no field with id {name_or_id}")
            return f
        name = name_or_id
        fid = self._name_to_id.get(name)
        if fid is None and not case_sensitive:
            fid = self._name_to_id.get(name.lower())
        if fid is None:
            raise ValueError(f"no field named {name!r} in schema {self.column_names}")
        return self._id_to_field[fid]

    def find_column_name(self, field_id: int) -> Optional[str]:
        return self._id_to_name.get(field_id)

    def field_ids(self) -> Set[int]:
        return set(self._id_to_field.keys())

    @property
    def column_names(self) -> List[str]:
        return [f.name for f in self.fields]

    @property
    def highest_field_id(self) -> int:
        return max(self._id_to_field.keys(), default=0)

    def as_struct(self) -> StructType:
        return StructType(*self.fields)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Schema) and self.as_struct() == other.as_struct()

    def __repr__(self) -> str:
        return f"Schema(schema_id={self.schema_id}, {', '.join(repr(f) for f in self.fields)})"

    # -- projection (reference: schema.py:1492 prune_columns) -------------
    def select(self, *names: str, case_sensitive: bool = True) -> "Schema":
        if "*" in names:
            return self
        ids = {self.find_field(n, case_sensitive).field_id for n in names}
        # keep original field order
        fields = [f for f in self.fields if f.field_id in ids]
        return Schema(*fields, schema_id=self.schema_id, identifier_field_ids=self.identifier_field_ids)

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        d = type_to_dict(self.as_struct())
        d["schema-id"] = self.schema_id
        if self.identifier_field_ids:
            d["identifier-field-ids"] = self.identifier_field_ids
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Schema":
        struct = type_from_dict(d)
        assert isinstance(struct, StructType)
        return cls(
            *struct.fields,
            schema_id=d.get("schema-id", 0),
            identifier_field_ids=d.get("identifier-field-ids", []),
        )

    # -- Spark interop -----------------------------------------------------
    def to_spark(self) -> T.StructType:
        return T.StructType([_to_spark_field(f) for f in self.fields])

    def as_arrow(self) -> "pyarrow.Schema":
        """The schema as a pyarrow Schema (reference schema.py
        ``Schema.as_arrow`` / pyarrow_schema visitor), via Spark's own
        Arrow type mapping so exports agree with ``to_arrow`` outputs."""
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self.to_spark())

    def name_mapping(self) -> "NameMapping":
        """Default name mapping for this schema (reference schema.py
        name_mapping property)."""
        from .name_mapping import NameMapping

        return NameMapping.from_schema(self)


def promote(file_type: IcebergType, read_type: IcebergType) -> bool:
    """True if a value of file_type may be read as read_type
    (reference: schema.py:1647-1723)."""
    if file_type == read_type:
        return True
    if isinstance(file_type, IntegerType) and isinstance(read_type, LongType):
        return True
    if isinstance(file_type, FloatType) and isinstance(read_type, DoubleType):
        return True
    if isinstance(file_type, DateType) and isinstance(read_type, TimestampType):
        return True
    if (
        isinstance(file_type, DecimalType)
        and isinstance(read_type, DecimalType)
        and file_type.scale == read_type.scale
        and read_type.precision >= file_type.precision
    ):
        return True
    return False


def schema_from_spark(struct: T.StructType, schema_id: int = 0) -> Schema:
    """Infer an Iceberg schema from a Spark StructType, reusing IDs stored
    in field metadata when present, else assigning fresh sequential IDs
    (reference: io/pyarrow.py:1588 _ConvertToIcebergWithoutIDs)."""
    counter = [0]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    # first pass: find max existing id so fresh ids don't collide
    def scan_max(dt: T.DataType) -> int:
        m = 0
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                if f.metadata and FIELD_ID_KEY in f.metadata:
                    m = max(m, int(f.metadata[FIELD_ID_KEY]))
                m = max(m, scan_max(f.dataType))
        elif isinstance(dt, T.ArrayType):
            m = max(m, scan_max(dt.elementType))
        elif isinstance(dt, T.MapType):
            m = max(m, scan_max(dt.keyType), scan_max(dt.valueType))
        return m

    counter[0] = scan_max(struct)

    def convert(dt: T.DataType) -> IcebergType:
        if isinstance(dt, T.StructType):
            out = []
            for f in dt.fields:
                fid = int(f.metadata[FIELD_ID_KEY]) if (f.metadata and FIELD_ID_KEY in f.metadata) else next_id()
                out.append(NestedField(fid, f.name, convert(f.dataType), required=not f.nullable))
            return StructType(*out)
        if isinstance(dt, T.ArrayType):
            return ListType(next_id(), convert(dt.elementType), element_required=not dt.containsNull)
        if isinstance(dt, T.MapType):
            kid, vid = next_id(), next_id()
            return MapType(kid, convert(dt.keyType), vid, convert(dt.valueType), value_required=not dt.valueContainsNull)
        return from_spark_type(dt)

    top = convert(struct)
    assert isinstance(top, StructType)
    return Schema(*top.fields, schema_id=schema_id)


def assign_fresh_ids(schema: Schema, schema_id: int = 0) -> Schema:
    """Reassign all field IDs sequentially in pre-order (used on create_table,
    mirroring the reference's new-table ID assignment)."""
    counter = [0]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    def convert(t: IcebergType) -> IcebergType:
        if isinstance(t, StructType):
            fields = []
            for f in t.fields:
                fid = next_id()
                fields.append((fid, f))
            # assign child ids after this level (spec pre-orders parents first)
            out = []
            for fid, f in fields:
                out.append(
                    NestedField(
                        fid, f.name, convert(f.field_type), required=f.required, doc=f.doc,
                        initial_default=f.initial_default, write_default=f.write_default,
                    )
                )
            return StructType(*out)
        if isinstance(t, ListType):
            eid = next_id()
            return ListType(eid, convert(t.element_type), t.element_required)
        if isinstance(t, MapType):
            kid, vid = next_id(), next_id()
            return MapType(kid, convert(t.key_type), vid, convert(t.value_type), t.value_required)
        return t

    top = convert(schema.as_struct())
    assert isinstance(top, StructType)
    # remap identifier field ids by name
    ident: List[int] = []
    new = Schema(*top.fields, schema_id=schema_id)
    for fid in schema.identifier_field_ids:
        name = schema.find_column_name(fid)
        if name:
            ident.append(new.find_field(name).field_id)
    return Schema(*top.fields, schema_id=schema_id, identifier_field_ids=ident)
