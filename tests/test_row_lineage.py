"""v3 row lineage: next-row-id / first-row-id assignment at commit
(reference table/metadata.py:574 + update/__init__.py:447-468) and the
implicit _row_id / _last_updated_sequence_number scan columns."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.schema import schema_from_spark
from iceberg_python_spark.table.metadata import TableMetadata


@pytest.fixture()
def v3(catalog, spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    return catalog.create_table(
        "db.v3lineage", schema_from_spark(df.schema), properties={"format-version": "3"}
    ), df


def test_assignment_and_scan(v3, spark):
    t, df = v3
    assert t.metadata.format_version == 3 and t.metadata.next_row_id == 0
    t.append(df)
    t.refresh()
    s1 = t.current_snapshot()
    assert s1.first_row_id == 0
    assert t.metadata.next_row_id == 100
    t.append(spark.range(100, 130).withColumn("v", F.col("id")))
    t.refresh()
    s2 = t.current_snapshot()
    assert s2.first_row_id == 100
    assert t.metadata.next_row_id == 130
    out = t.scan().to_df(row_lineage=True)
    rows = out.collect()
    ids = sorted(r._row_id for r in rows)
    # 130 rows, globally unique contiguous row ids
    assert ids == list(range(130))
    # batch-2 rows carry the later sequence number
    seq_by_batch = {r.id >= 100 for r in rows}
    by_new = {r._row_id for r in rows if r._last_updated_sequence_number == s2.sequence_number}
    assert by_new == set(range(100, 130))
    # metadata JSON round-trips next-row-id and first-row-id
    again = TableMetadata.read(t.metadata_location)
    assert again.next_row_id == 130
    assert again.current_snapshot().first_row_id == 100


def test_row_ids_stable_under_mor_delete(v3, spark):
    t, df = v3
    t.append(df)
    t.refresh()
    before = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    t.delete("id < 10", mode="merge-on-read")
    t.refresh()
    after = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    assert set(after) == set(range(10, 100))
    for k, v in after.items():
        assert before[k] == v  # surviving rows keep their row ids


def test_v2_table_rejects_lineage(catalog, spark):
    df = spark.range(5).withColumn("v", F.col("id"))
    t = catalog.create_table("db.v2nolineage", schema_from_spark(df.schema))
    t.append(df)
    with pytest.raises(ValueError, match="format-version 3"):
        t.scan().to_df(row_lineage=True)


def test_cow_delete_preserves_row_ids(v3, spark):
    t, df = v3
    t.append(df)
    t.refresh()
    before = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    t.delete("id < 10")  # CoW rewrite
    t.refresh()
    after = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    assert set(after) == set(range(10, 100))
    for k, v in after.items():
        assert before[k] == v  # carried rows keep their identity


def test_upsert_preserves_updated_row_ids(v3, spark):
    t, df = v3
    t.append(df)
    t.refresh()
    before = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    src = spark.createDataFrame([(5, 999), (7, 888), (500, 1)], "id: long, v: long")
    res = t.upsert(src, join_cols=["id"])
    assert res.rows_updated == 2 and res.rows_inserted == 1
    t.refresh()
    rows = {r.id: r for r in t.scan().to_df(row_lineage=True).collect()}
    # updated rows keep their row id with the new values
    assert rows[5]._row_id == before[5] and rows[5].v == 999
    assert rows[7]._row_id == before[7] and rows[7].v == 888
    # carried rows untouched; the insert got a fresh id beyond the old range
    assert rows[3]._row_id == before[3]
    assert rows[500]._row_id not in set(before.values())
    # ids stay globally unique
    ids = [r._row_id for r in rows.values()]
    assert len(ids) == len(set(ids))


def test_compaction_preserves_row_ids(v3, spark):
    t, df = v3
    t.append(df.where("id < 50"))
    t.refresh()
    t.append(df.where("id >= 50"))
    t.refresh()
    before = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    t.delete("id in (1, 2)", mode="merge-on-read")
    t.refresh()
    t.compact(min_input_files=1)
    t.refresh()
    after = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    assert set(after) == set(range(100)) - {1, 2}
    for k, v in after.items():
        assert before[k] == v


def test_mor_upsert_preserves_updated_row_ids(v3, spark):
    t, df = v3
    t.append(df)
    t.refresh()
    before = {r.id: r._row_id for r in t.scan().to_df(row_lineage=True).collect()}
    src = spark.createDataFrame([(11, 111), (600, 6)], "id: long, v: long")
    res = t.upsert(src, join_cols=["id"], mode="merge-on-read")
    assert res.rows_updated == 1 and res.rows_inserted == 1
    t.refresh()
    rows = {r.id: r for r in t.scan().to_df(row_lineage=True).collect()}
    assert rows[11]._row_id == before[11] and rows[11].v == 111
    assert rows[600]._row_id not in set(before.values())
    ids = [r._row_id for r in rows.values()]
    assert len(ids) == len(set(ids))


def test_materialized_row_id_carries_reserved_field_id(catalog, spark):
    """Rewritten v3 files materialize _row_id; spec-conformant external
    readers identify it by the reserved field id 2147483540, so the
    parquet footer must carry it like any table column's id."""
    import pyarrow.parquet as pq

    from iceberg_python_spark.schema import schema_from_spark

    df = spark.createDataFrame([(i, float(i)) for i in range(20)], "id: long, v: double")
    t = catalog.create_table(
        "db.rowid_fid", schema_from_spark(df.schema), properties={"format-version": "3"}
    )
    t.append(df)
    t.delete("id < 5")  # CoW rewrite materializes surviving rows' ids
    t.refresh()
    paths = [e["data_file"]["file_path"] for e in t._live_entries(t.current_snapshot())]
    found = False
    for p in paths:
        sch = pq.read_schema(p)
        if "_row_id" in sch.names:
            meta = sch.field("_row_id").metadata or {}
            assert meta.get(b"PARQUET:field_id") == b"2147483540", meta
            found = True
    assert found, "no rewritten file materialized _row_id"
