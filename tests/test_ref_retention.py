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


def test_expire_property_defaults(spark, tmp_path):
    """commit() with no explicit target applies the table's
    history.expire.* properties: snapshots older than max-snapshot-age
    expire, min-snapshots-to-keep newest survive regardless of age
    (reference TableProperties, table/__init__.py:209-213)."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark

    df = spark.createDataFrame([(1,)], "id: long")
    cat = ips.SqliteCatalog("expdef", str(tmp_path / "wh"), spark)
    t = cat.create_table(
        "db.aged",
        schema_from_spark(df.schema),
        properties={
            "history.expire.max-snapshot-age-ms": "1000000",
            "history.expire.min-snapshots-to-keep": "2",
        },
    )
    for _ in range(4):
        t.append(df)
        t = cat.load_table("db.aged")
    assert len(t.metadata.snapshots) == 4
    # pretend the future: everything is past max age, but the newest 2
    # on main are protected by min-snapshots-to-keep
    future = t.current_snapshot().timestamp_ms + 10_000_000
    t.expire_snapshots().commit(now_ms=future)
    t = cat.load_table("db.aged")
    assert len(t.metadata.snapshots) == 2
    # within the age window nothing expires
    t2 = cat.create_table(
        "db.young", schema_from_spark(df.schema),
        properties={"history.expire.max-snapshot-age-ms": str(10**12)},
    )
    t2.append(df)
    t2 = cat.load_table("db.young")
    t2.expire_snapshots().commit()
    t2 = cat.load_table("db.young")
    assert len(t2.metadata.snapshots) == 1


def test_metadata_log_retention(spark, tmp_path):
    """write.metadata.previous-versions-max trims the metadata log;
    delete-after-commit removes the dropped metadata FILES only when
    opted in (reference table/__init__.py:143-147)."""
    import os

    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark

    df = spark.createDataFrame([(1,)], "id: long")
    cat = ips.SqliteCatalog("mlog", str(tmp_path / "wh"), spark)
    t = cat.create_table(
        "db.trimmed",
        schema_from_spark(df.schema),
        properties={
            "write.metadata.previous-versions-max": "2",
            "write.metadata.delete-after-commit.enabled": "true",
        },
    )
    locations = []
    for _ in range(5):
        locations.append(t.metadata_location)
        t.append(df)
        t = cat.load_table("db.trimmed")
    assert len(t.metadata.metadata_log) == 2
    # the oldest metadata files were physically deleted, newest kept
    kept = [e["metadata-file"] for e in t.metadata.metadata_log]
    assert all(os.path.exists(p) for p in kept)
    deleted = [p for p in locations if p not in kept]
    assert deleted and not any(os.path.exists(p) for p in deleted[:-1])
    # without the delete property, files survive trimming
    t2 = cat.create_table(
        "db.keepfiles", schema_from_spark(df.schema),
        properties={"write.metadata.previous-versions-max": "1"},
    )
    locs2 = []
    for _ in range(3):
        locs2.append(t2.metadata_location)
        t2.append(df)
        t2 = cat.load_table("db.keepfiles")
    assert len(t2.metadata.metadata_log) == 1
    assert all(os.path.exists(p) for p in locs2)
