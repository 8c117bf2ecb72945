"""Merge-on-read: position-delete writes, anti-join reads, interaction
with CoW rewrites, and compaction."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark import spec_from_names
from iceberg_python_spark.schema import schema_from_spark


@pytest.fixture()
def table(catalog, spark):
    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)], "id: long, grp: int, val: double"
    )
    t = catalog.create_table("db.mor", schema_from_spark(df.schema))
    t.append(df)
    return t


def test_mor_delete_and_scan(table):
    t = table
    files_before = {x.file_path for x in t.scan().plan_files()}
    t.delete("id >= 10 and id < 20", mode="merge-on-read")
    t.refresh()
    # data files untouched; a delete file was added
    files_after = {x.file_path for x in t.scan().plan_files()}
    assert files_after == files_before
    assert any(x.delete_files for x in t.scan().plan_files())
    assert t.scan().to_df().count() == 90
    assert t.scan().count() == 90  # count path applies deletes too
    assert t.scan(row_filter="id < 30").to_df().count() == 20
    rows = {r.id for r in t.scan().to_df().collect()}
    assert rows == set(range(10)) | set(range(20, 100))


def test_mor_stacked_deletes(table):
    t = table
    t.delete("id < 10", mode="merge-on-read")
    t.delete("id >= 90", mode="merge-on-read")
    t.refresh()
    assert t.scan().to_df().count() == 80
    # overlapping re-delete is idempotent
    t.delete("id < 15", mode="merge-on-read")
    t.refresh()
    assert t.scan().to_df().count() == 75


def test_cow_rewrite_respects_existing_mor_deletes(table):
    t = table
    t.delete("id < 10", mode="merge-on-read")
    t.refresh()
    # CoW delete rewrites files; must not resurrect MoR-deleted rows
    t.delete("val > 95.0", mode="copy-on-write")
    t.refresh()
    rows = {r.id for r in t.scan().to_df().collect()}
    assert rows == set(range(10, 96))


def test_upsert_on_mor_table(table, spark):
    t = table
    t.delete("id < 50", mode="merge-on-read")
    t.refresh()
    src = spark.createDataFrame([(60, 0, -1.0), (200, 1, 2.0)], "id: long, grp: int, val: double")
    res = t.upsert(src, join_cols=["id"])
    assert res.rows_updated == 1 and res.rows_inserted == 1
    rows = {r.id: r.val for r in t.scan().to_df().collect()}
    assert rows[60] == -1.0 and rows[200] == 2.0
    assert len(rows) == 51


def test_compact_removes_delete_debt(table):
    t = table
    t.delete("id >= 50", mode="merge-on-read")
    t.refresh()
    assert t.scan().to_df().count() == 50
    n_files_before = t.inspect.files().count()
    t.compact()
    t.refresh()
    assert t.scan().to_df().count() == 50
    # no delete files remain; all tasks clean
    assert all(not x.delete_files for x in t.scan().plan_files())
    assert t.inspect.delete_files().count() == 0
    assert t.current_snapshot().operation == "replace"
    rows = {r.id for r in t.scan().to_df().collect()}
    assert rows == set(range(50))


def test_mor_partitioned(catalog, spark):
    df = spark.createDataFrame([(i, f"g{i%3}") for i in range(90)], "id: long, grp: string")
    schema = schema_from_spark(df.schema)
    t = catalog.create_table("db.mor_part", schema, partition_spec=spec_from_names(schema, "grp"))
    t.append(df)
    t.delete("id < 30 and grp = 'g0'", mode="merge-on-read")
    t.refresh()
    assert t.scan().to_df().count() == 80
    # partition pruning still effective alongside deletes
    assert t.scan(row_filter="grp = 'g0'").to_df().count() == 20


def test_upsert_merge_on_read(catalog, spark):
    df = spark.createDataFrame([(i, i % 5, float(i)) for i in range(100)], "id: long, grp: int, val: double")
    t = catalog.create_table("db.mor_upsert", schema_from_spark(df.schema))
    t.append(df)
    n_snaps = len(t.snapshots())
    src = spark.createDataFrame(
        [(10, 0, -1.0), (20, 0, 20.0), (500, 1, 5.0)], "id: long, grp: int, val: double"
    )  # id=20 unchanged -> no update
    res = t.upsert(src, join_cols=["id"], mode="merge-on-read")
    t.refresh()
    assert res.rows_updated == 1 and res.rows_inserted == 1
    assert len(t.snapshots()) == n_snaps + 1  # single OVERWRITE commit
    assert t.current_snapshot().operation == "overwrite"
    rows = {r.id: r.val for r in t.scan().to_df().collect()}
    assert rows[10] == -1.0 and rows[20] == 20.0 and rows[500] == 5.0
    assert len(rows) == 101
    assert t.inspect.delete_files().count() >= 1
    # second MoR upsert stacks correctly on the first
    res2 = t.upsert(spark.createDataFrame([(10, 0, -2.0)], "id: long, grp: int, val: double"),
                    join_cols=["id"], mode="merge-on-read")
    t.refresh()
    assert res2.rows_updated == 1
    rows2 = {r.id: r.val for r in t.scan().to_df().collect()}
    assert rows2[10] == -2.0 and len(rows2) == 101


def test_list_packer():
    from iceberg_python_spark.io.bin_packing import ListPacker

    bins = ListPacker(10, lookback=2).pack([6, 4, 7, 1, 2, 9], lambda x: x)
    # every bin within target; all items preserved
    assert sorted(x for b in bins for x in b) == [1, 2, 4, 6, 7, 9]
    assert all(sum(b) <= 10 for b in bins)
    # lookback backfill: the 4 and 1/2 join earlier bins
    assert [6, 4] in bins and [7, 1, 2] in bins


def test_selective_compact_keeps_clean_files(catalog, spark):
    """BinPack compaction: small fragments merge, a clean right-sized
    file carries forward untouched, absorbed delete files are dropped."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "id: long, val: double")
    t = catalog.create_table("db.binpack", __import__("iceberg_python_spark").schema_from_spark(df.schema))
    # 5 small appends -> 5+ small files
    for k in range(5):
        t.append(df.where((F.col("id") % 5) == k).coalesce(1))
    t.refresh()
    paths_before = {x.file_path for x in t.scan().plan_files()}
    assert len(paths_before) == 5
    t.delete("id < 100", mode="merge-on-read")
    t.refresh()
    t.compact()
    t.refresh()
    assert t.scan().to_df().count() == 900
    assert {r.id for r in t.scan().to_df().collect()} == set(range(100, 1000))
    tasks = t.scan().plan_files()
    # fragments merged: fewer files, no delete debt
    assert len(tasks) < 5
    assert not any(x.delete_files for x in tasks)
    # append one right-sized clean file plus two fragments; selective
    # compact must leave the clean file's path untouched
    t.append(spark.createDataFrame([(i, 0.0) for i in range(2000, 9000)], "id: long, val: double").coalesce(1))
    t.refresh()
    big = {x.file_path for x in t.scan().plan_files()} - {x.file_path for x in tasks}
    t.append(spark.createDataFrame([(1500, 1.0)], "id: long, val: double"))
    t.append(spark.createDataFrame([(1501, 1.0)], "id: long, val: double"))
    t.refresh()
    big_size = max(
        x.data_file["file_size_in_bytes"] for x in t.scan().plan_files() if x.file_path in big
    )
    t.compact(target_file_size_bytes=big_size)  # big file fills a bin alone -> kept
    t.refresh()
    after = {x.file_path for x in t.scan().plan_files()}
    assert big <= after  # clean oversized file not rewritten
    assert t.scan().to_df().count() == 900 + 7000 + 2
