"""Write-to-branch (reference table/__init__.py:464 — append/overwrite/
delete/upsert take ``branch``): the WAP (write-audit-publish) pattern.
Writes advance only the branch ref; main and the snapshot log are
untouched until publish."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.schema import schema_from_spark


@pytest.fixture()
def wap(catalog, spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    t = catalog.create_table("db.wap", schema_from_spark(df.schema))
    t.append(df)
    t.manage_snapshots().create_branch(t.current_snapshot().snapshot_id, "audit").commit()
    t.refresh()
    return t


def test_append_to_branch_then_publish(wap, spark):
    main_head = wap.current_snapshot().snapshot_id
    wap.append(spark.range(100, 150).withColumn("v", F.col("id")), branch="audit")
    wap.refresh()
    # main untouched, branch advanced
    assert wap.current_snapshot().snapshot_id == main_head
    assert wap.scan().to_df().count() == 100
    assert wap.scan(use_ref="audit").to_df().count() == 150
    branch_head = wap.metadata.refs["audit"].snapshot_id
    assert branch_head != main_head
    # branch snapshot's parent is the branch base
    assert wap.metadata.snapshot_by_id(branch_head).parent_snapshot_id == main_head
    # snapshot log records only main lineage
    assert all(e.snapshot_id != branch_head for e in wap.metadata.snapshot_log)
    # publish: fast-forward main to the audited branch
    wap.manage_snapshots().set_current_snapshot(ref_name="audit").commit()
    wap.refresh()
    assert wap.scan().to_df().count() == 150


def test_delete_and_upsert_on_branch(wap, spark):
    wap.delete("id < 10", branch="audit")
    wap.refresh()
    assert wap.scan(use_ref="audit").to_df().count() == 90
    assert wap.scan().to_df().count() == 100
    src = spark.createDataFrame([(50, 9999), (200, 1)], "id: long, v: long")
    res = wap.upsert(src, join_cols=["id"], branch="audit")
    assert res.rows_updated == 1 and res.rows_inserted == 1
    wap.refresh()
    rows = {r.id: r.v for r in wap.scan(use_ref="audit").to_df().collect()}
    assert rows[50] == 9999 and rows[200] == 1 and len(rows) == 91
    # main still pristine
    assert wap.scan().to_df().where("v = 9999").count() == 0


def test_multi_op_transaction_on_branch(wap, spark):
    with wap.transaction(branch="audit") as tx:
        tx.append(spark.range(1000, 1010).withColumn("v", F.col("id")))
        tx.delete("id >= 1005")
    wap.refresh()
    assert wap.scan(use_ref="audit").to_df().where("id >= 1000").count() == 5
    assert wap.scan().to_df().where("id >= 1000").count() == 0


def test_branch_write_errors(wap, spark):
    df = spark.range(5).withColumn("v", F.col("id"))
    with pytest.raises(ValueError, match="unknown branch"):
        wap.append(df, branch="nope")
    wap.manage_snapshots().create_tag(wap.current_snapshot().snapshot_id, "v1").commit()
    wap.refresh()
    with pytest.raises(ValueError, match="is a tag"):
        wap.append(df, branch="v1")


def test_branch_retention_fields_survive_write(wap, spark):
    wap.manage_snapshots().create_branch(
        wap.current_snapshot().snapshot_id, "keepy", min_snapshots_to_keep=3
    ).commit()
    wap.refresh()
    wap.append(spark.range(3).withColumn("v", F.col("id")), branch="keepy")
    wap.refresh()
    assert wap.metadata.refs["keepy"].min_snapshots_to_keep == 3


def test_concurrent_branch_vs_main_appends_both_land(catalog, spark):
    df = spark.range(10).withColumn("v", F.col("id"))
    t = catalog.create_table("db.wap2", schema_from_spark(df.schema))
    t.append(df)
    t.manage_snapshots().create_branch(t.current_snapshot().snapshot_id, "b").commit()
    t.refresh()
    # a main append lands between branch-txn start and commit: the branch
    # write must rebase cleanly (no overlap — different refs)
    h1 = catalog.load_table("db.wap2")
    h2 = catalog.load_table("db.wap2")
    tx = h1.transaction(branch="b")
    tx.append(spark.range(100, 105).withColumn("v", F.col("id")))
    h2.append(spark.range(200, 203).withColumn("v", F.col("id")))
    tx.commit_transaction()
    t.refresh()
    assert t.scan().to_df().count() == 13
    assert t.scan(use_ref="b").to_df().count() == 15


def test_compact_and_eq_deletes_on_branch(wap, spark):
    wap.delete("id < 20", branch="audit", mode="merge-on-read")
    wap.refresh()
    wap.add_equality_deletes(
        spark.createDataFrame([(25,)], "id: long"), ["id"], branch="audit"
    )
    wap.refresh()
    assert wap.scan(use_ref="audit").to_df().count() == 79
    wap.compact(branch="audit")
    wap.refresh()
    assert wap.scan(use_ref="audit").to_df().count() == 79
    # main never saw any of it
    assert wap.scan().to_df().count() == 100
