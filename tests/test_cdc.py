from pyspark.sql import functions as F

from iceberg_python_spark import UNPARTITIONED
from iceberg_python_spark.operators.cdc import scd2_from_changelog
from iceberg_python_spark.schema import schema_from_spark


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k long, val string, _change_type string, _change_ordinal int, _change_snapshot_id long"
    )


def test_scd2_versions_and_carried_collapse(spark):
    rows = [
        # k=1: inserted at 0, updated at 2 (delete old + insert new)
        (1, "v0", "insert", 0, 100),
        (1, "v0", "delete", 2, 102),
        (1, "v1", "insert", 2, 102),
        # k=2: inserted at 0, carried through a rewrite at 1 (no-op
        # delete+insert pair, identical values) -> ONE version
        (2, "w0", "insert", 0, 100),
        (2, "w0", "delete", 1, 101),
        (2, "w0", "insert", 1, 101),
        # k=3: inserted at 1, hard-deleted at 2 -> one closed version
        (3, "x0", "insert", 1, 101),
        (3, "x0", "delete", 2, 102),
    ]
    out = scd2_from_changelog(_chg(spark, rows), keys=["k"]).collect()
    got = {(r["k"], r["val"]): (r["valid_from"], r["valid_to"], r["is_current"]) for r in out}
    assert got == {
        (1, "v0"): (0, 2, False),
        (1, "v1"): (2, None, True),
        (2, "w0"): (0, None, True),
        (3, "x0"): (1, 2, False),
    }
    assert len(out) == 4


def test_scd2_without_collapse_shows_churn(spark):
    rows = [
        (2, "w0", "insert", 0, 100),
        (2, "w0", "delete", 1, 101),
        (2, "w0", "insert", 1, 101),
    ]
    out = scd2_from_changelog(_chg(spark, rows), keys=["k"], collapse_carried=False).collect()
    got = sorted((r["valid_from"], r["valid_to"]) for r in out)
    # storage churn surfaces as two versions when collapse is off
    assert got == [(0, 1), (1, None)]


def test_scd2_same_ordinal_delete_does_not_close_same_insert(spark):
    # an update emits delete(old)+insert(new) at ONE ordinal; the delete
    # must close the old version, never the new one
    rows = [
        (5, "a", "insert", 3, 103),
        (5, "b", "insert", 7, 107),
        (5, "a", "delete", 7, 107),
    ]
    out = scd2_from_changelog(_chg(spark, rows), keys=["k"]).collect()
    got = {r["val"]: (r["valid_from"], r["valid_to"]) for r in out}
    assert got == {"a": (3, 7), "b": (7, None)}


def test_scd2_from_real_changelog(spark, catalog):
    df = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0)],
        "id long, name string, score double",
    )
    t = catalog.create_table("db.dim", schema_from_spark(df.schema), partition_spec=UNPARTITIONED)
    t.append(df)
    t.upsert(
        spark.createDataFrame(
            [(2, "beta", 25.0), (4, "delta", 40.0)], "id long, name string, score double"
        ),
        join_cols=["id"],
    )
    changes = t.incremental_changelog_scan().to_df()
    hist = scd2_from_changelog(changes, keys=["id"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append(r)
    # unchanged dims: exactly one current version despite the CoW rewrite
    for k in (1, 3):
        assert len(by_key[k]) == 1 and by_key[k][0]["is_current"]
    # updated dim: closed old version + current new one
    vers = sorted(by_key[2], key=lambda r: r["valid_from"])
    assert len(vers) == 2
    assert vers[0]["score"] == 20.0 and not vers[0]["is_current"]
    assert vers[1]["score"] == 25.0 and vers[1]["is_current"]
    # inserted dim: one current version opened at the upsert ordinal
    assert len(by_key[4]) == 1 and by_key[4][0]["is_current"]
    assert by_key[4][0]["valid_from"] == vers[1]["valid_from"]
