"""Record linkage: blocking, summed distances, deterministic best match."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.linkage import record_linkage


def test_record_linkage_blocked_best_match(spark):
    clean = spark.createDataFrame(
        [
            (1, "US", "alice cooper"),
            (2, "US", "alice cooperx"),
            (3, "DE", "alice cooper"),  # right name, wrong block
            (4, "US", "bob marley"),
        ],
        "rid: long, country: string, name: string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "US", "alice coopre"),   # transposition: dist 2 to rid 1
            (11, "US", "bob marlee"),     # dist 1 to rid 4
            (12, "US", "zzzzzz"),         # no candidate in range
            (13, "FR", "alice cooper"),   # block with no right rows
        ],
        "did: long, country: string, name: string",
    )
    out = {
        r["did"]: r
        for r in record_linkage(
            dirty, clean, "did", "rid",
            block_on=[("country", "country")], compare=[("name", "name")],
            max_distance=2,
        ).collect()
    }
    assert set(out) == {10, 11}
    assert out[10]["rid"] == 1 and out[10]["distance"] == 2  # tie vs rid2 dist3
    assert out[11]["rid"] == 4 and out[11]["distance"] == 1
    # ties break to the smallest right id
    tie = record_linkage(
        spark.createDataFrame([(9, "US", "same")], "did: long, country: string, name: string"),
        spark.createDataFrame(
            [(7, "US", "same"), (5, "US", "same")], "rid: long, country: string, name: string"
        ),
        "did", "rid", [("country", "country")], [("name", "name")],
    ).collect()
    assert tie[0]["rid"] == 5 and tie[0]["distance"] == 0
    # best_only=False returns all candidates in range
    allc = record_linkage(
        dirty, clean, "did", "rid", [("country", "country")], [("name", "name")],
        max_distance=3, best_only=False,
    )
    assert allc.where("did = 10").count() == 2  # rid 1 (2) and rid 2 (3)


def test_record_linkage_guards(spark):
    df = spark.createDataFrame([(1, "a", "x")], "id: long, b: string, n: string")
    with pytest.raises(ValueError, match="blocking"):
        record_linkage(df, df.withColumnRenamed("id", "id2"), "id", "id2", [], [("n", "n")])
    with pytest.raises(ValueError, match="compare"):
        record_linkage(df, df.withColumnRenamed("id", "id2"), "id", "id2", [("b", "b")], [])
    with pytest.raises(ValueError, match="alias one side"):
        record_linkage(df, df, "id", "id", [("b", "b")], [("n", "n")])


def test_record_linkage_multi_compare_sums(spark):
    a = spark.createDataFrame([(1, "k", "abc", "def")], "id: long, b: string, x: string, y: string")
    b = spark.createDataFrame(
        [(2, "k", "abd", "dxf"), (3, "k", "abc", "zzzz")],
        "id2: long, b: string, x: string, y: string",
    )
    out = record_linkage(
        a, b, "id", "id2", [("b", "b")], [("x", "x"), ("y", "y")], max_distance=2
    ).collect()
    assert len(out) == 1 and out[0]["id2"] == 2 and out[0]["distance"] == 2
