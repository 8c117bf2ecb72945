"""Partition statistics files (reference table/statistics.py:46
PartitionStatisticsFile + update/statistics.py Set/RemovePartitionStatistics;
computation mirrors the Iceberg compute-partition-stats action)."""

import json

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark import spec_from_names
from iceberg_python_spark.schema import schema_from_spark


@pytest.fixture()
def ptable(catalog, spark):
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(400)], "id: long, k: int, val: double"
    )
    schema = schema_from_spark(df.schema)
    t = catalog.create_table("db.pstats", schema, partition_spec=spec_from_names(schema, "k"))
    t.append(df)
    return t


def test_compute_and_read(ptable):
    ptable.update_statistics().compute_partition_statistics().commit()
    ptable.refresh()
    entries = ptable.metadata.partition_statistics
    assert len(entries) == 1
    snap = ptable.current_snapshot().snapshot_id
    assert entries[0]["snapshot-id"] == snap
    assert entries[0]["file-size-in-bytes"] > 0
    stats = ptable.inspect.partition_statistics().orderBy("partition").collect()
    assert len(stats) == 4  # k in 0..3
    for r in stats:
        assert r.data_record_count == 100
        assert r.data_file_count >= 1
        assert r.position_delete_record_count == 0
        assert r.last_updated_snapshot_id == snap
    # metadata JSON round-trips the spec key
    from iceberg_python_spark.table.metadata import TableMetadata

    again = TableMetadata.read(ptable.metadata_location)
    assert again.partition_statistics == entries


def test_delete_counts_and_replacement(ptable):
    ptable.delete("val < 50", mode="merge-on-read")
    ptable.refresh()
    ptable.update_statistics().compute_partition_statistics().commit()
    ptable.refresh()
    stats = {json.loads(r.partition).get("k"): r for r in ptable.inspect.partition_statistics().collect()}
    # this engine writes position-delete files partition-agnostic (empty
    # partition tuple), so their counts aggregate under the {} row
    assert stats[None].position_delete_record_count == 50
    assert stats[None].position_delete_file_count >= 1
    for k in range(4):
        assert stats[k].data_record_count == 100
    # recompute after another commit replaces the same-snapshot entry set
    assert len(ptable.metadata.partition_statistics) == 1


def test_expire_drops_partition_stats(ptable, spark):
    ptable.update_statistics().compute_partition_statistics().commit()
    ptable.refresh()
    old_snap = ptable.current_snapshot().snapshot_id
    old_path = ptable.metadata.partition_statistics[0]["statistics-path"]
    df2 = spark.createDataFrame([(1000, 0, 1.0)], "id: long, k: int, val: double")
    ptable.append(df2)
    ptable.refresh()
    removed = ptable.expire_snapshots().expire_snapshot_id(old_snap).commit()
    ptable.refresh()
    assert ptable.metadata.partition_statistics == []
    assert old_path in removed


def test_remove_partition_statistics(ptable):
    ptable.update_statistics().compute_partition_statistics().commit()
    ptable.refresh()
    snap = ptable.current_snapshot().snapshot_id
    ptable.update_statistics().remove_partition_statistics(snap).commit()
    ptable.refresh()
    assert ptable.metadata.partition_statistics == []


def test_last_updated_follows_commit_order(ptable, spark):
    """Snapshot ids are random 62-bit values, NOT monotonic — the rolled-up
    last_updated_snapshot_id must track the entry with the highest
    sequence number, never max(snapshot_id)."""
    t = ptable
    # second append touching every partition: its snapshot is the latest
    # by commit order regardless of how its random id compares
    t.append(spark.createDataFrame([(1000 + i, i % 4, 0.0) for i in range(8)],
                                   "id: long, k: int, val: double"))
    t.refresh()
    latest = t.current_snapshot().snapshot_id
    t.update_statistics().compute_partition_statistics().commit()
    t.refresh()
    stats = t.inspect.partition_statistics().collect()
    assert stats
    assert all(r.last_updated_snapshot_id == latest for r in stats)
