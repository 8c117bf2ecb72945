"""Iceberg type system, re-expressed for a Spark-native engine.

Semantics follow the Apache Iceberg table spec as implemented by the
reference (pyiceberg/types.py). Every field carries a stable integer
field ID; Spark StructFields round-trip the ID through
``StructField.metadata["iceberg.id"]`` and parquet files written by
Spark carry ``parquet.field.id`` so files are resolvable by ID after
renames (reference: pyiceberg/types.py:385-506, schema.py:82).

Spark mapping notes (SURVEY.md §1.2):
- ``time``      -> LongType (µs since midnight; Spark has no TIME)
- ``uuid``      -> StringType (canonical form)
- ``fixed[n]``  -> BinaryType (length enforced at write)
- ``timestamp`` -> TimestampNTZType, ``timestamptz`` -> TimestampType
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, ClassVar, Dict, List, Optional, Tuple

from pyspark.sql import types as T


class IcebergType:
    """Base class. Instances are immutable and comparable by repr."""

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and repr(self) == repr(other)

    def __hash__(self) -> int:
        return hash(repr(self))

    @property
    def is_primitive(self) -> bool:
        return isinstance(self, PrimitiveType)

    def __str__(self) -> str:  # spec string form
        return repr(self)


class PrimitiveType(IcebergType):
    _name: ClassVar[str] = ""

    def __repr__(self) -> str:
        return self._name


class BooleanType(PrimitiveType):
    _name = "boolean"


class IntegerType(PrimitiveType):
    _name = "int"
    max: ClassVar[int] = 2147483647
    min: ClassVar[int] = -2147483648


class LongType(PrimitiveType):
    _name = "long"
    max: ClassVar[int] = 9223372036854775807
    min: ClassVar[int] = -9223372036854775808


class FloatType(PrimitiveType):
    _name = "float"


class DoubleType(PrimitiveType):
    _name = "double"


class DateType(PrimitiveType):
    _name = "date"


class TimeType(PrimitiveType):
    _name = "time"


class TimestampType(PrimitiveType):
    _name = "timestamp"


class TimestamptzType(PrimitiveType):
    _name = "timestamptz"


class TimestampNanoType(TimestampType):
    """v3 nanosecond timestamp (reference types.py:860). Subclasses the
    µs type so Spark-column code paths (which see the µs-downcast read
    representation) treat it as a timestamp, while metadata paths that
    hold raw internal longs (stats bounds, literals, temporal transforms)
    branch on the subclass FIRST and work in ns."""

    _name = "timestamp_ns"


class TimestamptzNanoType(TimestamptzType):
    """v3 nanosecond timestamptz (reference types.py:879)."""

    _name = "timestamptz_ns"


class StringType(PrimitiveType):
    _name = "string"


class UUIDType(PrimitiveType):
    _name = "uuid"


class BinaryType(PrimitiveType):
    _name = "binary"


class UnknownType(PrimitiveType):
    """v3 ``unknown`` (reference types.py:946): a column whose type is
    not known to the writer. Values are always null; files store no data
    for it — reads project NULL, writes drop the column."""

    _name = "unknown"


class GeometryType(BinaryType):
    """v3 geometry, carried as WKB binary (reference types.py:965).
    Spark has no native geo type; the engine passes WKB through as
    ``binary`` and preserves the CRS in the type string. Subclassing
    BinaryType routes stats bounds / literals / truncation through the
    binary domain (byte-prefix bounds, not the spec's geo bounding box —
    sound for equality/null pruning, no range pruning)."""

    def __init__(self, crs: str = "OGC:CRS84"):
        self.crs = crs

    def __repr__(self) -> str:
        return "geometry" if self.crs == "OGC:CRS84" else f"geometry({self.crs})"


class GeographyType(BinaryType):
    """v3 geography: WKB binary + CRS + edge-interpolation algorithm
    (reference types.py:1031)."""

    def __init__(self, crs: str = "OGC:CRS84", algorithm: str = "spherical"):
        self.crs = crs
        self.algorithm = algorithm

    def __repr__(self) -> str:
        if self.crs == "OGC:CRS84" and self.algorithm == "spherical":
            return "geography"
        if self.algorithm == "spherical":
            return f"geography({self.crs})"
        return f"geography({self.crs}, {self.algorithm})"


class DecimalType(PrimitiveType):
    def __init__(self, precision: int, scale: int):
        if precision > 38:
            raise ValueError(f"decimal precision > 38: {precision}")
        self.precision = precision
        self.scale = scale

    def __repr__(self) -> str:
        return f"decimal({self.precision}, {self.scale})"


class FixedType(PrimitiveType):
    def __init__(self, length: int):
        self.length = length

    def __repr__(self) -> str:
        return f"fixed[{self.length}]"


@dataclass(frozen=True)
class NestedField:
    """A named, ID'd field (reference: pyiceberg/types.py:385)."""

    field_id: int
    name: str
    field_type: IcebergType
    required: bool = False
    doc: Optional[str] = None
    initial_default: Any = None
    write_default: Any = None

    def __repr__(self) -> str:
        req = "required" if self.required else "optional"
        return f"{self.field_id}: {self.name}: {req} {self.field_type}"


class StructType(IcebergType):
    def __init__(self, *fields: NestedField):
        self.fields: Tuple[NestedField, ...] = tuple(fields)

    def field_by_id(self, field_id: int) -> Optional[NestedField]:
        for f in self.fields:
            if f.field_id == field_id:
                return f
        return None

    def __repr__(self) -> str:
        return f"struct<{', '.join(repr(f) for f in self.fields)}>"


class ListType(IcebergType):
    def __init__(self, element_id: int, element_type: IcebergType, element_required: bool = False):
        self.element_id = element_id
        self.element_type = element_type
        self.element_required = element_required
        self.element_field = NestedField(element_id, "element", element_type, element_required)

    def __repr__(self) -> str:
        return f"list<{self.element_type}>"


class MapType(IcebergType):
    def __init__(
        self,
        key_id: int,
        key_type: IcebergType,
        value_id: int,
        value_type: IcebergType,
        value_required: bool = False,
    ):
        self.key_id = key_id
        self.key_type = key_type
        self.value_id = value_id
        self.value_type = value_type
        self.value_required = value_required
        self.key_field = NestedField(key_id, "key", key_type, True)
        self.value_field = NestedField(value_id, "value", value_type, value_required)

    def __repr__(self) -> str:
        return f"map<{self.key_type}, {self.value_type}>"


# ---------------------------------------------------------------------------
# spec-string <-> type  (used in metadata JSON)
# ---------------------------------------------------------------------------

_SIMPLE_TYPES: Dict[str, PrimitiveType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "date": DateType(),
    "time": TimeType(),
    "timestamp": TimestampType(),
    "timestamptz": TimestamptzType(),
    "timestamp_ns": TimestampNanoType(),
    "timestamptz_ns": TimestamptzNanoType(),
    "unknown": UnknownType(),
    "geometry": GeometryType(),
    "geography": GeographyType(),
    "string": StringType(),
    "uuid": UUIDType(),
    "binary": BinaryType(),
}


def primitive_from_string(s: str) -> PrimitiveType:
    s = s.strip()
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if s.startswith("decimal"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        p, sc = inner.split(",")
        return DecimalType(int(p), int(sc))
    if s.startswith("fixed"):
        inner = s[s.index("[") + 1 : s.rindex("]")]
        return FixedType(int(inner))
    if s.startswith("geometry("):
        return GeometryType(s[s.index("(") + 1 : s.rindex(")")].strip())
    if s.startswith("geography("):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        parts = [p.strip() for p in inner.split(",")]
        return GeographyType(*parts)
    raise ValueError(f"unknown primitive type string: {s}")


def type_to_dict(t: IcebergType) -> Any:
    """Serialize to the spec's JSON shape (metadata.json schemas)."""
    if isinstance(t, StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": f.field_id,
                    "name": f.name,
                    "required": f.required,
                    "type": type_to_dict(f.field_type),
                    **({"doc": f.doc} if f.doc else {}),
                    **({"initial-default": f.initial_default} if f.initial_default is not None else {}),
                    **({"write-default": f.write_default} if f.write_default is not None else {}),
                }
                for f in t.fields
            ],
        }
    if isinstance(t, ListType):
        return {
            "type": "list",
            "element-id": t.element_id,
            "element": type_to_dict(t.element_type),
            "element-required": t.element_required,
        }
    if isinstance(t, MapType):
        return {
            "type": "map",
            "key-id": t.key_id,
            "key": type_to_dict(t.key_type),
            "value-id": t.value_id,
            "value": type_to_dict(t.value_type),
            "value-required": t.value_required,
        }
    return repr(t)


def type_from_dict(d: Any) -> IcebergType:
    if isinstance(d, str):
        return primitive_from_string(d)
    kind = d["type"]
    if kind == "struct":
        return StructType(
            *[
                NestedField(
                    field_id=f["id"],
                    name=f["name"],
                    field_type=type_from_dict(f["type"]),
                    required=f.get("required", False),
                    doc=f.get("doc"),
                    initial_default=f.get("initial-default"),
                    write_default=f.get("write-default"),
                )
                for f in d["fields"]
            ]
        )
    if kind == "list":
        return ListType(d["element-id"], type_from_dict(d["element"]), d.get("element-required", False))
    if kind == "map":
        return MapType(
            d["key-id"],
            type_from_dict(d["key"]),
            d["value-id"],
            type_from_dict(d["value"]),
            d.get("value-required", False),
        )
    raise ValueError(f"unknown type dict: {d}")


# ---------------------------------------------------------------------------
# Iceberg <-> Spark type conversion
# ---------------------------------------------------------------------------

FIELD_ID_KEY = "iceberg.id"

_TO_SPARK: Dict[type, T.DataType] = {
    BooleanType: T.BooleanType(),
    IntegerType: T.IntegerType(),
    LongType: T.LongType(),
    FloatType: T.FloatType(),
    DoubleType: T.DoubleType(),
    DateType: T.DateType(),
    TimeType: T.LongType(),  # µs since midnight
    TimestampType: T.TimestampNTZType(),
    TimestamptzType: T.TimestampType(),
    # v3 ns timestamps surface as µs in Spark (µs-downcast read — the
    # same semantics the reference applies, io/pyarrow.py:1652-1657)
    TimestampNanoType: T.TimestampNTZType(),
    TimestamptzNanoType: T.TimestampType(),
    # v3 unknown: always-null column; files store nothing for it
    UnknownType: T.NullType(),
    StringType: T.StringType(),
    UUIDType: T.StringType(),
    BinaryType: T.BinaryType(),
}


def to_spark_type(t: IcebergType) -> T.DataType:
    if type(t) in _TO_SPARK:
        return _TO_SPARK[type(t)]
    if isinstance(t, DecimalType):
        return T.DecimalType(t.precision, t.scale)
    if isinstance(t, FixedType):
        return T.BinaryType()
    if isinstance(t, (GeometryType, GeographyType)):
        return T.BinaryType()  # WKB passthrough
    if isinstance(t, StructType):
        return T.StructType([_to_spark_field(f) for f in t.fields])
    if isinstance(t, ListType):
        return T.ArrayType(to_spark_type(t.element_type), containsNull=not t.element_required)
    if isinstance(t, MapType):
        return T.MapType(
            to_spark_type(t.key_type), to_spark_type(t.value_type), valueContainsNull=not t.value_required
        )
    raise ValueError(f"cannot convert {t} to a Spark type")


def _to_spark_field(f: NestedField) -> T.StructField:
    return T.StructField(
        f.name,
        to_spark_type(f.field_type),
        nullable=not f.required,
        metadata={FIELD_ID_KEY: f.field_id},
    )


def from_spark_type(dt: T.DataType) -> IcebergType:
    """Best-effort Spark -> Iceberg (used when inferring from a DataFrame
    without IDs; mirrors io/pyarrow.py:1588 _ConvertToIcebergWithoutIDs)."""
    if isinstance(dt, T.BooleanType):
        return BooleanType()
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return IntegerType()
    if isinstance(dt, T.LongType):
        return LongType()
    if isinstance(dt, T.FloatType):
        return FloatType()
    if isinstance(dt, T.DoubleType):
        return DoubleType()
    if isinstance(dt, T.DecimalType):
        return DecimalType(dt.precision, dt.scale)
    if isinstance(dt, T.DateType):
        return DateType()
    if isinstance(dt, T.TimestampNTZType):
        return TimestampType()
    if isinstance(dt, T.TimestampType):
        return TimestamptzType()
    if isinstance(dt, T.StringType):
        return StringType()
    if isinstance(dt, T.BinaryType):
        return BinaryType()
    if isinstance(dt, T.NullType):
        return UnknownType()
    raise ValueError(f"cannot convert Spark type {dt} (use explicit nested conversion)")
