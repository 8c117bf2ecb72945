"""Helpers for distributed (Spark-side) manifest processing.

Partition tuples are stored in manifests as JSON of *internal*
representations (conversions.py); this maps an Iceberg type to the Spark
type that from_json should parse that internal value as.
"""

from __future__ import annotations

from pyspark.sql import types as T

from .types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
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
