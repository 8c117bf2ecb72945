"""Snapshot-ref retention policies (reference table/refs.py:41 +
update/snapshot.py ExpireSnapshots): min-snapshots-to-keep /
max-snapshot-age-ms protect branch ancestors, max-ref-age-ms retires
tags and non-main branches."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.schema import schema_from_spark
from iceberg_python_spark.table.metadata import SnapshotRef


def _tbl(catalog, spark, name, n_snaps=4):
    df = spark.range(10).withColumn("v", F.col("id"))
    t = catalog.create_table(f"db.{name}", schema_from_spark(df.schema))
    for i in range(n_snaps):
        t.append(df)
        t.refresh()
    return t


def test_ref_validation():
    with pytest.raises(ValueError, match="tags only support"):
        SnapshotRef(1, "tag", min_snapshots_to_keep=2)
    with pytest.raises(ValueError, match="positive"):
        SnapshotRef(1, "branch", max_snapshot_age_ms=0)
    # round-trips through the spec dict keys
    r = SnapshotRef(7, "branch", min_snapshots_to_keep=3, max_snapshot_age_ms=100, max_ref_age_ms=200)
    assert SnapshotRef.from_dict(r.to_dict()) == r
    assert r.to_dict()["min-snapshots-to-keep"] == 3


def test_min_snapshots_to_keep_protects_ancestors(catalog, spark):
    t = _tbl(catalog, spark, "ret1", n_snaps=4)
    snaps = [s.snapshot_id for s in t.metadata.snapshots]  # oldest..newest
    head = t.current_snapshot().snapshot_id
    t.manage_snapshots().create_branch(head, "dev", min_snapshots_to_keep=3).commit()
    t.refresh()
    # try to expire everything old: the newest 3 ancestors stay protected
    t.expire_snapshots().expire_older_than(2**62).commit(clean_files=False)
    t.refresh()
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert kept == set(snaps[-3:])
    # table still scans at head
    assert t.scan().to_df().count() == 40


def test_max_snapshot_age_protects_recent(catalog, spark):
    t = _tbl(catalog, spark, "ret2", n_snaps=3)
    head = t.current_snapshot().snapshot_id
    t.manage_snapshots().create_branch(head, "dev", max_snapshot_age_ms=10**9).commit()
    t.refresh()
    # every ancestor is younger than 10^9 ms -> all protected despite the blanket expire
    n_before = len(t.metadata.snapshots)
    t.expire_snapshots().expire_older_than(2**62).commit(clean_files=False)
    t.refresh()
    assert len(t.metadata.snapshots) == n_before


def test_max_ref_age_retires_tag_and_branch(catalog, spark):
    t = _tbl(catalog, spark, "ret3", n_snaps=2)
    first = t.metadata.snapshots[0].snapshot_id
    head = t.current_snapshot().snapshot_id
    t.manage_snapshots().create_tag(first, "old-tag", max_ref_age_ms=1).create_branch(
        first, "old-branch", max_ref_age_ms=1
    ).create_tag(first, "keeper").commit()
    t.refresh()
    # far-future "now": the aged refs retire, the untimed tag stays, and
    # the first snapshot survives because "keeper" still points at it
    t.expire_snapshots().expire_older_than(2**62).commit(
        clean_files=False, now_ms=2**62
    )
    t.refresh()
    assert set(t.metadata.refs) == {"main", "keeper"}
    kept = {s.snapshot_id for s in t.metadata.snapshots}
    assert kept == {first, head}


def test_main_branch_never_retires(catalog, spark):
    t = _tbl(catalog, spark, "ret4", n_snaps=1)
    # even with an absurd now, main survives and the head stays
    t.expire_snapshots().expire_older_than(2**62).commit(clean_files=False, now_ms=2**62)
    t.refresh()
    assert "main" in t.metadata.refs
    assert t.scan().to_df().count() == 10
