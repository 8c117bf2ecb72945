"""Single-value serialization for stats bounds and partition values.

The reference serializes bounds as binary (pyiceberg/conversions.py:200-397)
because its manifests are Avro with binary stat fields. Our manifests are
parquet with JSON-encoded stat maps (SURVEY.md §7: semantic parity over
byte parity), so the codec here is value <-> JSON-friendly form, applied
to *internal* representations (dates=days, time/timestamps=µs).
"""

from __future__ import annotations

import base64
from decimal import Decimal
from typing import Any, Optional

from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    StringType,
    TimestamptzType,
    TimestampType,
    TimeType,
    UUIDType,
)

_INT_TYPES = (IntegerType, LongType, DateType, TimeType, TimestampType, TimestamptzType)


def value_to_json(value: Any, t: IcebergType) -> Any:
    if value is None:
        return None
    if isinstance(t, _INT_TYPES):
        return int(value)
    if isinstance(t, (FloatType, DoubleType)):
        return float(value)
    if isinstance(t, BooleanType):
        return bool(value)
    if isinstance(t, (StringType, UUIDType)):
        return str(value)
    if isinstance(t, DecimalType):
        return str(value)
    if isinstance(t, (BinaryType, FixedType)):
        return base64.b64encode(bytes(value)).decode("ascii")
    raise ValueError(f"cannot serialize value of type {t}")


def value_from_json(j: Any, t: IcebergType) -> Any:
    if j is None:
        return None
    if isinstance(t, _INT_TYPES):
        return int(j)
    if isinstance(t, (FloatType, DoubleType)):
        return float(j)
    if isinstance(t, BooleanType):
        return bool(j)
    if isinstance(t, (StringType, UUIDType)):
        return str(j)
    if isinstance(t, DecimalType):
        return Decimal(j)
    if isinstance(t, (BinaryType, FixedType)):
        return base64.b64decode(j)
    raise ValueError(f"cannot deserialize value of type {t}")
