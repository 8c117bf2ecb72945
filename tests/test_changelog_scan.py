"""Incremental changelog scan: row-level insert/delete stream between
snapshots (Iceberg changelog / Spark table_changes shape; beyond the
reference's append-only incremental scan)."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.schema import schema_from_spark


@pytest.fixture()
def tbl(catalog, spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id: long, val: double")
    t = catalog.create_table("db.chlog", schema_from_spark(df.schema))
    t.append(df)
    return t


def _changes(t, **kw):
    rows = t.incremental_changelog_scan(**kw).to_df().collect()
    by = {}
    for r in rows:
        by.setdefault((r._change_ordinal, r._change_type), set()).add(r.id)
    return by


def test_appends_and_mor_delete(tbl, spark):
    s1 = tbl.current_snapshot().snapshot_id
    tbl.append(spark.createDataFrame([(100, 1.0), (101, 2.0)], "id: long, val: double"))
    tbl.refresh()
    tbl.delete("id >= 98 and id <= 100", mode="merge-on-read")
    tbl.refresh()
    by = _changes(tbl, from_snapshot_id_exclusive=s1)
    assert by[(0, "insert")] == {100, 101}
    assert by[(1, "delete")] == {98, 99, 100}
    # full-range scan starts with the initial 100-row insert
    all_by = _changes(tbl)
    assert all_by[(0, "insert")] == set(range(100))


def test_cow_delete_emits_rewrite_pairs(tbl):
    s1 = tbl.current_snapshot().snapshot_id
    tbl.delete("id < 10")  # CoW: rewrites the file(s) holding 0..9
    tbl.refresh()
    by = _changes(tbl, from_snapshot_id_exclusive=s1)
    deleted = by[(0, "delete")]
    kept_reinserts = by.get((0, "insert"), set())
    # every dropped row appears as a delete; carried rows appear as
    # delete+insert pairs (Iceberg default changelog semantics) — net
    # effect: deletes minus reinserts == rows 0..9
    assert set(range(10)) <= deleted
    assert deleted - kept_reinserts == set(range(10))


def test_replace_snapshot_skipped(tbl, spark):
    tbl.delete("id < 5", mode="merge-on-read")
    tbl.refresh()
    s2 = tbl.current_snapshot().snapshot_id
    tbl.compact()
    tbl.refresh()
    assert tbl.current_snapshot().operation == "replace"
    by = _changes(tbl, from_snapshot_id_exclusive=s2)
    assert by == {}  # compaction is not a logical change


def test_dv_delete_rows_recovered(catalog, spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id: long, val: double")
    t = catalog.create_table(
        "db.chlog_dv",
        schema_from_spark(df.schema),
        properties={"write.delete.mode": "merge-on-read", "write.delete.format": "puffin"},
    )
    t.append(df)
    s1 = t.current_snapshot().snapshot_id
    t.delete("id in (7, 13, 42)")
    t.refresh()
    by = _changes(t, from_snapshot_id_exclusive=s1)
    assert by[(0, "delete")] == {7, 13, 42}


def test_eq_delete_raises(tbl, spark):
    s1 = tbl.current_snapshot().snapshot_id
    tbl.add_equality_deletes(spark.createDataFrame([(3,)], "id: long"), ["id"])
    tbl.refresh()
    with pytest.raises(NotImplementedError, match="equality"):
        tbl.incremental_changelog_scan(from_snapshot_id_exclusive=s1).to_df()


def test_non_ancestor_raises(tbl, spark):
    with pytest.raises(ValueError, match="not an ancestor"):
        tbl.incremental_changelog_scan(from_snapshot_id_exclusive=12345).to_df()


def test_table_to_table_cdc_replication(catalog, spark, tmp_path):
    """changelog_source -> upsert_stream replicates one engine table into
    another (inserts + MoR deletes), no external change log."""
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.streaming import changelog_source, upsert_stream

    df = spark.createDataFrame([(i, float(i)) for i in range(30)], "id: long, val: double")
    src = catalog.create_table("db.cdc_src_t", schema_from_spark(df.schema))
    src.append(df)
    src.append(spark.createDataFrame([(100, 1.0)], "id: long, val: double"))
    src.refresh()
    src.delete("id < 5", mode="merge-on-read")
    src.refresh()

    changes, cursor = changelog_source(src)
    assert cursor == src.current_snapshot().snapshot_id
    # replay the changelog into a replica via the changefeed sink
    replica = catalog.create_table("db.cdc_replica", schema_from_spark(df.schema))
    feed_dir = str(tmp_path / "feed")
    changes.drop("_change_snapshot_id").write.mode("append").parquet(feed_dir)
    stream = spark.readStream.schema(
        "id long, val double, _change_type string, _change_ordinal int"
    ).parquet(feed_dir)
    q = upsert_stream(
        stream,
        replica,
        str(tmp_path / "ckpt"),
        join_cols=["id"],
        dedupe_keep_last_by="_change_ordinal",
        op_col="_change_type",
        delete_values=("delete",),
    )
    q.awaitTermination(120)
    replica.refresh()
    want = {r.id: r.val for r in src.scan().to_df().collect()}
    got = {r.id: r.val for r in replica.scan().to_df().collect()}
    assert got == want
    # incremental poll from the cursor: no further changes
    more, cursor2 = changelog_source(src, cursor)
    assert more.count() == 0 and cursor2 == cursor


@pytest.mark.parametrize("seed", [7, 23])
def test_changelog_replay_reconstructs_state(catalog, spark, seed):
    """Property: replaying the full changelog (last change per key wins,
    deletes drop the key) reconstructs the table's current state, for a
    randomized append/MoR-delete/MoR-upsert history."""
    import random

    rng = random.Random(seed)
    t = catalog.create_table(
        f"db.chprop_{seed}",
        schema_from_spark(spark.createDataFrame([(0, 0)], "id: long, v: long").schema),
    )
    next_id = 0
    live = set()
    for step in range(5):
        op = rng.choice(["append", "delete", "upsert"]) if live else "append"
        if op == "append":
            n = rng.randint(3, 8)
            rows = [(next_id + i, rng.randint(0, 99)) for i in range(n)]
            next_id += n
            t.append(spark.createDataFrame(rows, "id: long, v: long"))
            live |= {r[0] for r in rows}
        elif op == "delete":
            victims = sorted(rng.sample(sorted(live), min(3, len(live))))
            t.delete(f"id in ({', '.join(map(str, victims))})", mode="merge-on-read")
            live -= set(victims)
        else:
            keys = sorted(rng.sample(sorted(live), min(2, len(live))))
            rows = [(k, rng.randint(100, 199)) for k in keys] + [(next_id, 1)]
            live.add(next_id)
            next_id += 1
            t.upsert(spark.createDataFrame(rows, "id: long, v: long"),
                     join_cols=["id"], mode="merge-on-read")
        t.refresh()

    from iceberg_python_spark.streaming import net_changes

    changes = t.incremental_changelog_scan().to_df()
    final = net_changes(changes, ["id"]).select("id", "v")
    want = {(r.id, r.v) for r in t.scan().to_df().collect()}
    got = {(r.id, r.v) for r in final.collect()}
    assert got == want
    assert {r[0] for r in want} == live


def test_changelog_across_column_rename(tbl, spark):
    """Files written BEFORE a rename must still populate the renamed
    column (field-id projection, not name matching) in changelog rows."""
    s1 = tbl.current_snapshot().snapshot_id
    tbl.update_schema().rename_column("val", "value").commit()
    tbl.refresh()
    tbl.append(spark.createDataFrame([(200, 5.0)], "id: long, value: double"))
    tbl.refresh()
    tbl.delete("id < 2", mode="merge-on-read")  # pos-delete recovery reads pre-rename files
    tbl.refresh()
    rows = tbl.incremental_changelog_scan().to_df().collect()
    # every row carries a non-null renamed value — including inserts from
    # pre-rename files and delete rows recovered from them
    assert all(r.value is not None for r in rows)
    by = _changes(tbl, from_snapshot_id_exclusive=s1)
    assert by[(0, "insert")] == {200}
    assert by[(1, "delete")] == {0, 1}
    deleted_vals = {
        r.value for r in rows if r._change_type == "delete" and r.id in (0, 1)
    }
    assert deleted_vals == {0.0, 1.0}


def test_changelog_multi_snapshot_accumulated_deletes(tbl, spark):
    """Several MoR delete snapshots stack up (heavy-churn CDC shape):
    each ordinal recovers exactly its own snapshot's deleted rows, and
    replaying the log reconstructs the final state."""
    s1 = tbl.current_snapshot().snapshot_id
    for lo, hi in ((0, 10), (10, 25), (25, 30)):
        tbl.delete(f"id >= {lo} and id < {hi}", mode="merge-on-read")
        tbl.refresh()
    by = _changes(tbl, from_snapshot_id_exclusive=s1)
    assert by[(0, "delete")] == set(range(0, 10))
    assert by[(1, "delete")] == set(range(10, 25))
    assert by[(2, "delete")] == set(range(25, 30))
    live = {r.id for r in tbl.scan().to_df().collect()}
    assert live == set(range(30, 100))
