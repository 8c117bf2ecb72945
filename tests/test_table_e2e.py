"""M1 end-to-end: create_table → append → scan with pruning → writes.

Mirrors the reference's integration strategy (SURVEY.md §5) with the
testdata parquet as input and direct Spark reads as the oracle.
"""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark import spec_from_names
from iceberg_python_spark.expressions import AlwaysTrue
from iceberg_python_spark.schema import schema_from_spark

from .conftest import SF_DIR


@pytest.fixture()
def lineitem_df(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture()
def lineitem_table(catalog, lineitem_df):
    schema = schema_from_spark(lineitem_df.schema)
    spec = spec_from_names(schema, ("l_shipdate", "month"))
    t = catalog.create_table("db.lineitem", schema, partition_spec=spec)
    t.append(lineitem_df)
    return t


def test_append_scan_roundtrip(lineitem_table, lineitem_df):
    t = lineitem_table
    assert t.scan().to_df().count() == lineitem_df.count()
    # values roundtrip
    a = sorted(map(tuple, t.scan().to_df().collect()))
    b = sorted(map(tuple, lineitem_df.collect()))
    assert a == b


def test_filter_scan_matches_oracle(lineitem_table, lineitem_df):
    t = lineitem_table
    got = t.scan(row_filter="l_shipdate <= '1995-06-30' and l_quantity > 40").to_df().count()
    want = lineitem_df.where("l_shipdate <= timestamp'1995-06-30' and l_quantity > 40").count()
    assert got == want


def test_partition_pruning_skips_files(lineitem_table):
    t = lineitem_table
    all_files = t.scan().plan_files()
    pruned = t.scan(row_filter="l_shipdate < '1996-01-01'").plan_files()
    assert len(pruned) < len(all_files)
    assert len(pruned) > 0


def test_select_and_limit(lineitem_table):
    df = lineitem_table.scan(selected_fields=("l_orderkey", "l_quantity"), limit=10).to_df()
    assert df.columns == ["l_orderkey", "l_quantity"]
    assert df.count() == 10


def test_count_fast_path(lineitem_table, lineitem_df):
    t = lineitem_table
    assert t.scan().count() == lineitem_df.count()
    got = t.scan(row_filter="l_quantity > 40").count()
    assert got == lineitem_df.where("l_quantity > 40").count()


def test_time_travel(lineitem_table, lineitem_df, spark):
    t = lineitem_table
    snap1 = t.current_snapshot().snapshot_id
    extra = lineitem_df.limit(100)
    t.append(extra)
    assert t.scan().to_df().count() == lineitem_df.count() + 100
    assert t.scan(snapshot_id=snap1).to_df().count() == lineitem_df.count()


def test_delete_cow(lineitem_table, lineitem_df):
    t = lineitem_table
    t.delete("l_quantity > 40")
    want = lineitem_df.where("NOT coalesce(l_quantity > 40, false)").count()
    assert t.scan().to_df().count() == want
    # metadata-only whole-partition delete
    before_files = {task.file_path for task in t.scan().plan_files()}
    t.delete("l_shipdate < '1996-01-01'")
    after_files = {task.file_path for task in t.scan().plan_files()}
    assert after_files < before_files


def test_overwrite_filter(lineitem_table, lineitem_df):
    t = lineitem_table
    replacement = lineitem_df.where("l_quantity <= 10").withColumn("l_quantity", F.lit(999.0))
    t.overwrite(replacement, "l_quantity <= 10")
    assert t.scan(row_filter="l_quantity = 999.0").to_df().count() == lineitem_df.where("l_quantity <= 10").count()
    assert t.scan().to_df().count() == lineitem_df.count()


def test_upsert(catalog, spark):
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id: long, name: string, val: double"
    )
    schema = schema_from_spark(src.schema)
    t = catalog.create_table("db.upsert_t", schema)
    t.append(src)
    changes = spark.createDataFrame(
        [(2, "b", 21.0), (3, "c", 30.0), (4, "d", 40.0)], "id: long, name: string, val: double"
    )
    res = t.upsert(changes, join_cols=["id"])
    assert res.rows_updated == 1  # id=3 unchanged -> not updated
    assert res.rows_inserted == 1
    rows = {r.id: r.val for r in t.scan().to_df().collect()}
    assert rows == {1: 10.0, 2: 21.0, 3: 30.0, 4: 40.0}


def test_upsert_cow_partitioned_no_duplicates(catalog, spark):
    """Regression: a partitioned fan-out write reuses one Spark task's
    part-file NAME across every partition directory, so mapping lineage
    paths by basename collapsed distinct files — the overwrite then missed
    rewritten files and kept stale row versions (dup keys)."""
    from iceberg_python_spark import spec_from_names

    df = spark.createDataFrame([(i, float(i)) for i in range(2000)], "id: long, val: double")
    schema = schema_from_spark(df.schema)
    t = catalog.create_table(
        "db.upsert_bkt", schema, partition_spec=spec_from_names(schema, ("id", "bucket[8]"))
    )
    t.append(df)
    changes = spark.createDataFrame(
        [(i, float(i) + 0.5) for i in range(0, 2000, 10)] + [(9991, 1.0), (9992, 2.0)],
        "id: long, val: double",
    )
    res = t.upsert(changes, join_cols=["id"])
    assert res.rows_updated == 200 and res.rows_inserted == 2
    t.refresh()
    out = t.scan().to_df()
    assert out.count() == 2002
    assert out.groupBy("id").count().where("count > 1").count() == 0
    rows = {r.id: r.val for r in out.where("id in (0, 10, 5, 9991)").collect()}
    assert rows == {0: 0.5, 10: 10.5, 5: 5.0, 9991: 1.0}


def test_upsert_cow_collects_no_unbounded_keys(catalog, spark, monkeypatch):
    """Scale regression: CoW upsert must never .collect() row keys —
    only the affected-file list (and the bounded ≤10001-key scan
    prefilter) may reach the driver."""
    import pyspark.sql

    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "id: long, val: double")
    schema = schema_from_spark(df.schema)
    t = catalog.create_table("db.upsert_nc", schema)
    t.append(df)
    t.append(spark.createDataFrame([(i, float(i)) for i in range(1000, 2000)], "id: long, val: double"))

    collected = []
    orig = pyspark.sql.DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected.append(([f.name for f in self.schema.fields], len(rows)))
        return rows

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", spy)
    changes = spark.createDataFrame([(i, float(i) + 0.5) for i in range(0, 2000, 3)], "id: long, val: double")
    res = t.upsert(changes, join_cols=["id"])
    monkeypatch.undo()
    assert res.rows_updated == 667 and res.rows_inserted == 0
    for cols, n in collected:
        if cols == ["_ips_file"]:
            continue  # affected-file list: bounded by file count
        assert n <= 10001, f"unbounded driver collect of {cols}: {n} rows"
    t.refresh()
    rows = {r.id: r.val for r in t.scan().to_df().collect()}
    assert len(rows) == 2000
    assert rows[0] == 0.5 and rows[1] == 1.0 and rows[3] == 3.5


def test_dynamic_partition_overwrite(catalog, spark):
    df = spark.createDataFrame(
        [(1, "2024-01-15", 1.0), (2, "2024-02-15", 2.0), (3, "2024-03-15", 3.0)],
        "id: long, d: string, v: double",
    ).withColumn("d", F.to_date("d"))
    schema = schema_from_spark(df.schema)
    spec = spec_from_names(schema, ("d", "month"))
    t = catalog.create_table("db.dpo_t", schema, partition_spec=spec)
    t.append(df)
    replacement = spark.createDataFrame([(9, "2024-02-20", 9.0)], "id: long, d: string, v: double").withColumn(
        "d", F.to_date("d")
    )
    t.dynamic_partition_overwrite(replacement)
    rows = sorted((r.id, r.v) for r in t.scan().to_df().collect())
    assert rows == [(1, 1.0), (3, 3.0), (9, 9.0)]


def test_add_files(catalog, spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id: long, s: string")
    ext = str(tmp_path / "external")
    df.repartition(1).write.parquet(ext)
    paths = [os.path.join(ext, f) for f in os.listdir(ext) if f.endswith(".parquet")]
    schema = schema_from_spark(df.schema)
    t = catalog.create_table("db.addf_t", schema)
    t.add_files(paths)
    assert t.scan().to_df().count() == 2
    with pytest.raises(ValueError):
        t.add_files(paths)  # duplicate registration rejected


def test_incremental_append_scan(lineitem_table, lineitem_df):
    t = lineitem_table
    snap1 = t.current_snapshot().snapshot_id
    t.append(lineitem_df.limit(50))
    snap2 = t.current_snapshot().snapshot_id
    inc = t.incremental_append_scan(from_snapshot_id_exclusive=snap1, to_snapshot_id_inclusive=snap2)
    assert inc.to_df().count() == 50


def test_incremental_scan_non_ancestor_raises(lineitem_table, lineitem_df):
    t = lineitem_table
    t.append(lineitem_df.limit(10))
    snap2 = t.current_snapshot().snapshot_id
    # an id that is not in the ancestry chain of snap2
    with pytest.raises(ValueError, match="not an ancestor"):
        t.incremental_append_scan(
            from_snapshot_id_exclusive=123456789, to_snapshot_id_inclusive=snap2
        ).plan_files()


def test_incremental_scan_broken_chain_raises(lineitem_table, lineitem_df):
    """An expired intermediate snapshot must not silently truncate the
    range (ADVICE r2): unless the unresolvable parent IS the exclusive
    start, the scan raises instead of over/under-reading."""
    t = lineitem_table
    snap1 = t.current_snapshot().snapshot_id
    t.append(lineitem_df.limit(10))
    mid = t.current_snapshot().snapshot_id
    t.append(lineitem_df.limit(5))
    snap3 = t.current_snapshot().snapshot_id
    # simulate expiration of the middle snapshot
    t.metadata.snapshots = [s for s in t.metadata.snapshots if s.snapshot_id != mid]
    with pytest.raises(ValueError, match="not an ancestor"):
        t.incremental_append_scan(
            from_snapshot_id_exclusive=snap1, to_snapshot_id_inclusive=snap3
        ).plan_files()
    # the expired snapshot AS the exclusive start is a valid bound: all
    # its descendants are still present
    inc = t.incremental_append_scan(from_snapshot_id_exclusive=mid, to_snapshot_id_inclusive=snap3)
    assert inc.to_df().count() == 5


def test_concurrent_appends_rebase(catalog, spark):
    """Two writers appending from the same base: the CAS loser validates
    (appends never conflict) and replays on the winner's snapshot
    (reference Transaction retry + update/validate.py)."""
    df1 = spark.createDataFrame([(1,)], "id: long")
    df2 = spark.createDataFrame([(2,)], "id: long")
    schema = schema_from_spark(df1.schema)
    catalog.create_table("db.conflict_t", schema)
    t1 = catalog.load_table("db.conflict_t")
    t2 = catalog.load_table("db.conflict_t")
    t1.append(df1)
    t2.append(df2)  # stale pointer -> validated rebase, not failure
    t1.refresh()
    assert {r.id for r in t1.scan().to_df().collect()} == {1, 2}
    assert len(t1.snapshots()) == 2


def test_concurrent_delete_append_conflict_detected(catalog, spark):
    """A filter-based delete staged against a base that concurrently
    gained matching rows must FAIL, not silently under-delete."""
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id: long, val: double")
    schema = schema_from_spark(df.schema)
    t0 = catalog.create_table("db.conflict_d", schema)
    t0.append(df)
    t1 = catalog.load_table("db.conflict_d")
    t2 = catalog.load_table("db.conflict_d")
    # t1 appends rows that match t2's delete filter; t1 wins the CAS
    t1.append(spark.createDataFrame([(100, 100.0)], "id: long, val: double"))
    from iceberg_python_spark import CommitFailedException

    with pytest.raises(CommitFailedException, match="conflict"):
        t2.delete("id >= 5")
    # non-matching concurrent append: delete rebases cleanly
    t3 = catalog.load_table("db.conflict_d")
    t4 = catalog.load_table("db.conflict_d")
    t3.append(spark.createDataFrame([(-1, -1.0)], "id: long, val: double"))
    t4.delete("id >= 5")  # -1 doesn't match -> rebase succeeds
    t3.refresh()
    ids = {r.id for r in t3.scan().to_df().collect()}
    assert ids == {-1, 0, 1, 2, 3, 4}


def test_concurrent_double_delete_conflict_detected(catalog, spark):
    """Two writers deleting overlapping files from the same base: the
    loser detects its removed files are already gone."""
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id: long, val: double")
    schema = schema_from_spark(df.schema)
    t0 = catalog.create_table("db.conflict_dd", schema)
    t0.append(df)
    t1 = catalog.load_table("db.conflict_dd")
    t2 = catalog.load_table("db.conflict_dd")
    t1.delete("id >= 0")  # removes everything; wins
    from iceberg_python_spark import CommitFailedException

    with pytest.raises(CommitFailedException, match="conflict"):
        t2.delete("id >= 5")  # its target files were rewritten/deleted


def test_static_table(lineitem_table, spark):
    from iceberg_python_spark import StaticTable

    st = StaticTable.from_metadata(lineitem_table.location, spark)
    assert st.scan().to_df().count() == lineitem_table.scan().to_df().count()


def test_distributed_planning_matches_driver_side(catalog, spark, lineitem_df):
    schema = schema_from_spark(lineitem_df.schema)
    spec = spec_from_names(schema, ("l_shipdate", "month"))
    t = catalog.create_table(
        "db.li_dist", schema, partition_spec=spec,
        properties={"read.plan.distributed-threshold": "1000000"},
    )
    t.append(lineitem_df)
    flt = "l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01' and l_quantity > 30"
    driver_tasks = {x.file_path for x in t.scan(row_filter=flt).plan_files()}
    all_files = {x.file_path for x in t.scan().plan_files()}
    # force the distributed path: JVM-side partition + metrics pruning is a
    # sound relaxation (keeps a superset; float bounds aren't pruned
    # JVM-side), and the residual filter keeps results identical
    t.metadata.properties["read.plan.distributed-threshold"] = "0"
    dist_tasks = {x.file_path for x in t.scan(row_filter=flt).plan_files()}
    assert driver_tasks <= dist_tasks
    assert len(dist_tasks) < len(all_files), "distributed planner pruned nothing"
    assert t.scan(row_filter=flt).to_df().count() == lineitem_df.where(
        "l_shipdate >= timestamp'1996-01-01' and l_shipdate < timestamp'1997-01-01' and l_quantity > 30"
    ).count()
    # long AND double bounds are pruned JVM-side, matching the driver
    # evaluator (double path is NaN-guarded: Spark orders NaN above every
    # double, so unguarded bounds would over-prune — round-5 fix)
    for f in ["l_orderkey < 0", "l_orderkey >= 1", "l_quantity > 49.5", "l_quantity < 1.5", "l_extendedprice < 0.0"]:
        t.metadata.properties["read.plan.distributed-threshold"] = "1000000"
        drv = {x.file_path for x in t.scan(row_filter=f).plan_files()}
        t.metadata.properties["read.plan.distributed-threshold"] = "0"
        dst = {x.file_path for x in t.scan(row_filter=f).plan_files()}
        assert drv == dst, f
    assert t.scan(row_filter="l_orderkey < 0").plan_files() == []


def test_add_files_orc(catalog, spark, tmp_path):
    df = spark.createDataFrame([(i, f"s{i}") for i in range(50)], "id: long, s: string")
    ext = str(tmp_path / "orc_ext")
    df.repartition(1).write.orc(ext)
    paths = [os.path.join(ext, f) for f in os.listdir(ext) if f.endswith(".orc")]
    schema = schema_from_spark(df.schema)
    t = catalog.create_table("db.orc_t", schema)
    t.add_files(paths)
    assert t.scan().to_df().count() == 50
    # pruning works from the Spark-computed ORC stats
    assert t.scan(row_filter="id > 100").plan_files() == []
    assert t.scan(row_filter="id < 10").to_df().count() == 10
    assert t.scan(row_filter="id >= 25").count() == 25


def test_rewrite_zorder_multi_column_pruning(catalog, spark):
    """Z-order rewrite: an unsorted table prunes nothing on either
    column; after rewrite_zorder(x, y) BOTH columns' range filters prune
    files, and the data is byte-identical."""
    import pyspark.sql.functions as F

    # two independent uniform dims, written unsorted (random row order)
    df = (
        spark.range(40_000)
        .select(
            F.col("id"),
            (F.xxhash64(F.col("id")) % 1000).alias("x"),
            (F.xxhash64(F.col("id"), F.lit(7)) % 1000).alias("y"),
        )
        .withColumn("x", F.abs("x"))
        .withColumn("y", F.abs("y"))
    )
    schema = schema_from_spark(df.schema)
    t = catalog.create_table(
        "db.zorder_t", schema,
        properties={"write.parquet.max-records-per-file": "2500"},
    )
    t.append(df)
    t = t.refresh()
    n_files = len(t.scan().plan_files())
    assert n_files >= 8, n_files
    flt_x, flt_y = "x >= 100 and x < 200", "y >= 500 and y < 600"
    # unsorted: every file spans ~full range on both dims -> no pruning
    assert len(t.scan(row_filter=flt_x).plan_files()) == n_files
    assert len(t.scan(row_filter=flt_y).plan_files()) == n_files
    before = t.scan().to_df().agg(
        F.count("*"), F.sum("id"), F.sum("x"), F.sum("y")
    ).collect()[0]

    t.rewrite_zorder(["x", "y"], target_file_size_bytes=40_000)
    t = t.refresh()
    after_files = len(t.scan().plan_files())
    assert after_files >= 8, after_files
    after = t.scan().to_df().agg(
        F.count("*"), F.sum("id"), F.sum("x"), F.sum("y")
    ).collect()[0]
    assert tuple(before) == tuple(after)
    # clustered: a 10% range filter on EITHER dim must skip most files
    for flt in (flt_x, flt_y):
        matched = len(t.scan(row_filter=flt).plan_files())
        assert matched <= after_files // 2, (flt, matched, after_files)
    # row-level results still exact
    assert t.scan(row_filter=flt_x).to_df().count() == df.where("x >= 100 and x < 200").count()


def test_distributed_planning_avro_metadata(catalog, spark, lineitem_df):
    """An avro-metadata twin of the distributed-planning test: spec Avro
    manifests decode ON EXECUTORS into the same row layout, and the
    distributed planner prunes identically to the driver-side path."""
    schema = schema_from_spark(lineitem_df.schema)
    spec = spec_from_names(schema, ("l_shipdate", "month"))
    t = catalog.create_table(
        "db.li_dist_avro", schema, partition_spec=spec,
        properties={
            "read.plan.distributed-threshold": "1000000",
            "write.metadata.format": "avro",
        },
    )
    t.append(lineitem_df)
    assert t.current_snapshot().manifest_list.endswith(".avro")
    flt = "l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01' and l_quantity > 30"
    driver_tasks = {x.file_path for x in t.scan(row_filter=flt).plan_files()}
    all_files = {x.file_path for x in t.scan().plan_files()}
    t.metadata.properties["read.plan.distributed-threshold"] = "0"
    dist_tasks = {x.file_path for x in t.scan(row_filter=flt).plan_files()}
    assert driver_tasks <= dist_tasks
    assert len(dist_tasks) < len(all_files), "distributed planner pruned nothing"
    assert t.scan(row_filter=flt).to_df().count() == lineitem_df.where(
        "l_shipdate >= timestamp'1996-01-01' and l_shipdate < timestamp'1997-01-01' and l_quantity > 30"
    ).count()
    # bounds-pruning parity driver vs distributed on avro metadata
    for f in ["l_orderkey < 0", "l_orderkey >= 1", "l_quantity > 49.5"]:
        t.metadata.properties["read.plan.distributed-threshold"] = "1000000"
        drv = {x.file_path for x in t.scan(row_filter=f).plan_files()}
        t.metadata.properties["read.plan.distributed-threshold"] = "0"
        dst = {x.file_path for x in t.scan(row_filter=f).plan_files()}
        assert drv == dst, f
    # MoR on the distributed avro path: deletes still apply
    t.metadata.properties["read.plan.distributed-threshold"] = "0"
    before = t.scan().to_df().count()
    t.delete("l_quantity > 45", mode="merge-on-read")
    t.metadata.properties["read.plan.distributed-threshold"] = "0"
    got = t.scan().to_df().count()
    want = lineitem_df.where("l_quantity <= 45 or l_quantity is null").count()
    assert got == want and got < before


def test_incremental_scan_fluent_builders_and_exports(catalog, spark):
    """Fluent from/to builders mirror the reference's API; inclusive
    start = exclusive parent; Arrow/pandas exports go through the lazy
    DataFrame plane."""
    df1 = spark.range(0, 10).withColumn("v", F.col("id"))
    t = catalog.create_table("db.inc_fluent", schema_from_spark(df1.schema))
    t.append(df1)
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.range(10, 15).withColumn("v", F.col("id")))
    s2 = t.current_snapshot().snapshot_id
    t.append(spark.range(15, 18).withColumn("v", F.col("id")))

    scan = t.incremental_append_scan().from_snapshot_id_exclusive(s1).to_snapshot_id_inclusive(s2)
    assert sorted(r.id for r in scan.to_df().collect()) == list(range(10, 15))
    # inclusive start: snapshot s2's own appends included
    inc = t.incremental_append_scan().from_snapshot_id_inclusive(s2).to_snapshot_id_inclusive(s2)
    assert sorted(r.id for r in inc.to_df().collect()) == list(range(10, 15))
    assert scan.to_arrow().num_rows == 5
    assert len(scan.to_pandas()) == 5
    # DataScan.update / with_case_sensitive builders
    base = t.scan()
    assert base.update(row_filter="id < 5").to_df().count() == 5
    assert base.with_case_sensitive(False).update(selected_fields=("ID",)).to_df().columns == ["id"]


def test_partition_summaries_in_snapshot(catalog, spark):
    """write.summary.partition-limit emits per-partition summary entries
    (reference snapshots.py:300-345 SnapshotSummaryCollector.build):
    changed-partition-count always, partitions.<hive-path> counters when
    the changed count fits under the limit."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, cat string"
    )
    schema = schema_from_spark(df.schema)
    spec = spec_from_names(schema, ("cat", "identity"))
    t = catalog.create_table(
        "db.psum_t", schema, partition_spec=spec,
        properties={"write.summary.partition-limit": "10"},
    )
    t.append(df)
    s = t.current_snapshot().summary
    assert s["changed-partition-count"] == "2"
    assert s["partition-summaries-included"] == "true"
    assert "added-data-files=" in s["partitions.cat=a"]
    assert "added-records=2" in s["partitions.cat=a"]
    assert "added-records=1" in s["partitions.cat=b"]
    # a delete touching only one partition summarizes only that partition
    t.delete("cat = 'b'")
    s2 = t.current_snapshot().summary
    assert s2["changed-partition-count"] == "1"
    assert "deleted-records=1" in s2["partitions.cat=b"]
    assert "partitions.cat=a" not in s2


def test_partition_summaries_off_by_default(catalog, spark):
    """Default limit 0: the count is still recorded but no per-partition
    entries render (reference default write.summary.partition-limit=0)."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, cat string")
    schema = schema_from_spark(df.schema)
    spec = spec_from_names(schema, ("cat", "identity"))
    t = catalog.create_table("db.psum_off", schema, partition_spec=spec)
    t.append(df)
    s = t.current_snapshot().summary
    assert s["changed-partition-count"] == "2"
    assert not any(k.startswith("partitions.") for k in s)
    assert "partition-summaries-included" not in s
