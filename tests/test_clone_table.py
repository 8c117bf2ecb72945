"""catalog.clone_table — the Iceberg snapshot-table action: metadata-only
clone sharing the source's data files (Spark SnapshotTableSparkAction shape).
"""

import posixpath

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark import spec_from_names
from iceberg_python_spark.schema import schema_from_spark


def _paths(t):
    return {e["data_file"]["file_path"] for e in t._live_entries(t.current_snapshot())}


def test_clone_shares_files_and_matches(catalog, spark):
    df = spark.range(1000).withColumn("k", (F.col("id") % 7).cast("int")).withColumn("v", F.col("id") * 2)
    schema = schema_from_spark(df.schema)
    src = catalog.create_table("db.src", schema, partition_spec=spec_from_names(schema, "k"))
    src.append(df)
    dst = catalog.clone_table("db.src", "db.dst")
    # zero data copied: identical file paths, all under the source location
    assert _paths(dst) == _paths(src)
    assert dst.scan().to_df().count() == 1000
    # scans agree value-for-value, and pruning still works on the clone
    got = dst.scan(row_filter="k == 3", selected_fields=("id", "v")).to_df()
    exp = df.where("k = 3").select("id", "v")
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    # clone's snapshot records its provenance
    summ = dst.current_snapshot().summary
    assert summ.get("cloned-from") == "db.src"


def test_clone_is_independent(catalog, spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    src = catalog.create_table("db.src2", schema_from_spark(df.schema))
    src.append(df)
    dst = catalog.clone_table("db.src2", "db.dst2")
    # write to the clone: source untouched
    dst.append(spark.range(100, 110).withColumn("v", F.col("id")))
    dst.refresh()
    src.refresh()
    assert dst.scan().to_df().count() == 110
    assert src.scan().to_df().count() == 100
    # CoW delete on the clone rewrites into the CLONE's location and
    # never deletes shared files — source still scans clean
    shared = _paths(src)
    dst.delete("id < 50")
    dst.refresh()
    assert dst.scan().to_df().count() == 60
    src.refresh()
    assert src.scan().to_df().count() == 100
    for p in _paths(dst) - shared:
        assert p.startswith(dst.location), p


def test_clone_snapshot_id_and_delete_guard(catalog, spark):
    df = spark.range(50).withColumn("v", F.col("id"))
    src = catalog.create_table("db.src3", schema_from_spark(df.schema))
    src.append(df)
    snap1 = src.current_snapshot().snapshot_id
    src.append(spark.range(50, 60).withColumn("v", F.col("id")))
    src.refresh()
    old = catalog.clone_table("db.src3", "db.dst3_old", snapshot_id=snap1)
    assert old.scan().to_df().count() == 50
    # MoR delete leaves delete files in the snapshot -> clone refuses
    src.delete("id < 5", mode="merge-on-read")
    src.refresh()
    with pytest.raises(ValueError, match="delete-free"):
        catalog.clone_table("db.src3", "db.dst3_bad")
    # after compaction the snapshot is delete-free again
    src.compact()
    src.refresh()
    ok = catalog.clone_table("db.src3", "db.dst3_ok")
    assert ok.scan().to_df().count() == 55
