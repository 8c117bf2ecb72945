"""v3 scalar types: timestamp_ns / timestamptz_ns (µs-downcast read,
reference types.py:860,879 + io/pyarrow.py:1652-1657), unknown
(types.py:946), geometry / geography as WKB-binary passthrough
(types.py:965,1031)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F, types as T

from iceberg_python_spark.schema import Schema
from iceberg_python_spark.types import (
    GeographyType,
    GeometryType,
    LongType,
    NestedField,
    StringType,
    TimestampNanoType,
    TimestamptzNanoType,
    TimestampType,
    UnknownType,
    primitive_from_string,
    type_from_dict,
    type_to_dict,
    to_spark_type,
)


def test_spec_string_round_trip():
    cases = [
        (TimestampNanoType(), "timestamp_ns"),
        (TimestamptzNanoType(), "timestamptz_ns"),
        (UnknownType(), "unknown"),
        (GeometryType(), "geometry"),
        (GeometryType("EPSG:4326"), "geometry(EPSG:4326)"),
        (GeographyType(), "geography"),
        (GeographyType("EPSG:4326"), "geography(EPSG:4326)"),
        (GeographyType("EPSG:4326", "vincenty"), "geography(EPSG:4326, vincenty)"),
    ]
    for t, s in cases:
        assert repr(t) == s
        assert primitive_from_string(s) == t
        assert type_from_dict(type_to_dict(t)) == t
    # ns types are NOT equal to their µs parents despite subclassing
    assert TimestampNanoType() != TimestampType()
    assert primitive_from_string("timestamp") == TimestampType()


def test_spark_mapping():
    assert to_spark_type(TimestampNanoType()) == T.TimestampNTZType()
    assert to_spark_type(TimestamptzNanoType()) == T.TimestampType()
    assert to_spark_type(UnknownType()) == T.NullType()
    assert to_spark_type(GeometryType("EPSG:4326")) == T.BinaryType()
    assert to_spark_type(GeographyType()) == T.BinaryType()


def test_ns_internal_domain():
    """Literals for ns columns land in the ns comparison domain, so
    metrics pruning compares ns bounds against ns literals."""
    from iceberg_python_spark.expressions import internal_to_python, to_internal

    t = dt.datetime(2024, 5, 1, 12, 0, 0)
    us = to_internal(t, TimestampType())
    ns = to_internal(t, TimestampNanoType())
    assert ns == us * 1000
    assert to_internal("2024-05-01T12:00:00", TimestampNanoType()) == ns
    assert internal_to_python(ns, TimestampNanoType()) == t


def test_temporal_transforms_on_ns():
    """year/month/day/hour transforms divide ns internals to µs first —
    partition derivation from ns footer bounds stays correct."""
    from iceberg_python_spark.transforms import parse_transform

    t = dt.datetime(2001, 7, 4, 9, 30)
    us = int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    for name in ("year", "month", "day", "hour"):
        tr = parse_transform(name)
        assert tr.transform(TimestampNanoType())(us * 1000) == tr.transform(TimestampType())(us), name


@pytest.fixture()
def ns_table(catalog, spark, tmp_path):
    """A table whose schema declares timestamp_ns, populated by
    registering a REAL ns parquet file (written by pyarrow) through
    add_files + name mapping — the foreign-v3-table interop shape."""
    from iceberg_python_spark.name_mapping import PROPERTY_KEY, NameMapping

    schema = Schema(
        NestedField(1, "id", LongType(), required=True),
        NestedField(2, "ts", TimestampNanoType()),
        NestedField(3, "note", StringType()),
    )
    t = catalog.create_table(
        "db.ns_t",
        schema,
        properties={PROPERTY_KEY: NameMapping.from_schema(schema).to_json()},
    )
    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    ns_vals = [
        # sub-µs precision present: ...001 ns offsets truncate on read
        int((base - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000_000) + i * 3_600_000_000_000 + 1
        for i in range(4)
    ]
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ns_vals, pa.timestamp("ns")),
            "note": pa.array(["a", "b", "c", "d"], pa.string()),
        }
    )
    p = str(tmp_path / "ns_data.parquet")
    pq.write_table(tbl, p)
    t.add_files([p])
    t.refresh()
    return t, base


def test_ns_table_scan_downcasts_to_us(ns_table, spark):
    t, base = ns_table
    df = t.scan().to_df()
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    rows = {r.id: r.ts for r in df.collect()}
    # ns payload truncated to µs (the reference's read downcast)
    assert rows[1] == base
    assert rows[4] == base + dt.timedelta(hours=3)


def test_ns_table_filter(ns_table, spark):
    t, base = ns_table
    got = sorted(
        r.id for r in t.scan(row_filter="ts >= '2024-05-01T02:00:00'").to_df().collect()
    )
    assert got == [3, 4]
    # count() exercises the metrics fast path over ns bounds
    assert t.scan(row_filter="ts >= '2024-05-01T02:00:00'").count() == 2


def test_ns_write_rejected(ns_table, spark):
    t, _ = ns_table
    df = spark.createDataFrame([(9, dt.datetime(2024, 1, 1), "x")], "id: long, ts: timestamp_ntz, note: string")
    with pytest.raises(ValueError, match="read-only"):
        t.append(df)


def test_unknown_column_reads_null_and_writes_nothing(catalog, spark):
    schema = Schema(
        NestedField(1, "id", LongType(), required=True),
        NestedField(2, "mystery", UnknownType()),
        NestedField(3, "v", StringType()),
    )
    t = catalog.create_table("db.unk_t", schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id: long, v: string"))
    t.refresh()
    df = t.scan().to_df()
    assert [f.name for f in df.schema.fields] == ["id", "mystery", "v"]
    rows = {r.id: (r.mystery, r.v) for r in df.collect()}
    assert rows == {1: (None, "a"), 2: (None, "b")}
    # the written parquet must not contain the unknown column
    files = [e["data_file"]["file_path"] for e in t._live_entries(t.current_snapshot())]
    assert all("mystery" not in pq.read_schema(f).names for f in files)


def test_geometry_wkb_passthrough(catalog, spark):
    schema = Schema(
        NestedField(1, "id", LongType(), required=True),
        NestedField(2, "geom", GeometryType("EPSG:4326")),
        NestedField(3, "geog", GeographyType()),
    )
    t = catalog.create_table("db.geo_t", schema)
    wkb_point = bytes.fromhex("0101000000000000000000f03f0000000000000040")  # POINT(1 2)
    df = spark.createDataFrame([(1, wkb_point, wkb_point)], "id: long, geom: binary, geog: binary")
    t.append(df)
    t.refresh()
    got = t.scan().to_df().collect()[0]
    assert bytes(got.geom) == wkb_point and bytes(got.geog) == wkb_point
    # schema JSON round-trips the CRS
    rt = type_from_dict(type_to_dict(t.schema().find_field(2).field_type))
    assert rt == GeometryType("EPSG:4326")
