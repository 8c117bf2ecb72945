"""remove_orphan_files: the RemoveOrphanFiles maintenance action."""

import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark import UNPARTITIONED
from iceberg_python_spark.io.fileio import to_local
from iceberg_python_spark.schema import schema_from_spark


def _mk_table(spark, catalog, name):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, v string")
    t = catalog.create_table(name, schema_from_spark(df.schema), partition_spec=UNPARTITIONED)
    t.append(df.where("id % 2 = 0"))
    t.append(df.where("id % 2 = 1"))
    return t, df


def _plant(t, rel, age_s=0.0):
    p = os.path.join(to_local(t.location), rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(b"orphan bytes")
    if age_s:
        old = time.time() - age_s
        os.utime(p, (old, old))
    return p


def test_remove_orphan_files_sweeps_only_aged_unreferenced(spark, catalog):
    t, df = _mk_table(spark, catalog, "db.orph1")
    before = sorted(map(tuple, t.scan().to_df().collect()))
    old1 = _plant(t, "data/part-orphan-1.parquet", age_s=7 * 24 * 3600)
    old2 = _plant(t, "metadata/leftover.avro.tmp", age_s=7 * 24 * 3600)
    fresh = _plant(t, "data/part-inflight.parquet", age_s=0.0)
    # scan-plan dirs are excluded (their own age-guarded sweep)
    plan = _plant(t, "metadata/scan-plans/123-abc/m.parquet", age_s=7 * 24 * 3600)

    dry = t.remove_orphan_files(dry_run=True)
    assert os.path.exists(to_local(old1))  # dry run deletes nothing
    assert {os.path.basename(p) for p in dry} == {
        "part-orphan-1.parquet", "leftover.avro.tmp"
    }

    removed = t.remove_orphan_files()
    assert {os.path.basename(p) for p in removed} == {
        "part-orphan-1.parquet", "leftover.avro.tmp"
    }
    assert not os.path.exists(to_local(old1)) and not os.path.exists(to_local(old2))
    assert os.path.exists(to_local(fresh))  # grace period protects in-flight
    assert os.path.exists(to_local(plan))  # scan-plan sweep owns these
    # every referenced file survived: scans identical, inspect intact
    assert sorted(map(tuple, t.scan().to_df().collect())) == before
    assert t.inspect.files().count() >= 2


def test_remove_orphan_files_respects_history_and_property(spark, catalog):
    t, df = _mk_table(spark, catalog, "db.orph2")
    # a delete produces a new snapshot; OLD snapshots' files must stay
    # referenced until expired
    t.delete("id >= 90")
    old_files = {r["file_path"] for r in t.inspect.files(t.history()[0].snapshot_id).collect()} if hasattr(t, "history") else set()
    _plant(t, "data/zzz-orphan.bin", age_s=10 * 24 * 3600)
    with t.transaction() as tx:
        tx.set_properties({"gc.orphan-grace-ms": str(5 * 24 * 3600 * 1000)})
    t.refresh()
    removed = t.remove_orphan_files()
    assert [os.path.basename(p) for p in removed] == ["zzz-orphan.bin"]
    for p in old_files:
        assert os.path.exists(to_local(p)), p
    assert t.scan().to_df().count() == 90
