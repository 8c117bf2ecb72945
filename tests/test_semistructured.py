"""JSON metadata inference + JVM-side extraction."""

from pyspark.sql import functions as F

from iceberg_python_spark.operators.semistructured import (
    extract_json_fields,
    infer_json_fields,
)

ROWS = [
    (0, '{"k": 5, "tag": "a", "score": 1.5, "ok": true, "meta": {"d": 2}}'),
    (1, '{"k": 7, "tag": "b", "ids": [1, 2], "meta": {"d": 9}}'),
    (2, '{"k": 3.5, "extra": null}'),
    (3, "not json at all"),
    (4, None),
]


def test_infer_unions_sample_and_widens(spark):
    df = spark.createDataFrame(ROWS, "id: long, props: string")
    fields = infer_json_fields(df, "props")
    assert fields == {
        "extra": "string",   # only-null path carries as string
        "ids": "array",
        "k": "double",       # bigint + double widens
        "meta.d": "bigint",
        "ok": "boolean",
        "score": "double",
        "tag": "string",
    }


def test_extract_types_nulls_and_malformed(spark):
    df = spark.createDataFrame(ROWS, "id: long, props: string")
    out = extract_json_fields(df, "props").orderBy("id")
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[0]["k"] == 5.0 and got[0]["meta_d"] == 2 and got[0]["ok"] is True
    assert got[0]["tag"] == "a" and got[0]["score"] == 1.5
    assert got[1]["ids"] == "[1,2]"  # arrays come back as JSON text
    assert got[2]["k"] == 3.5 and got[2]["tag"] is None
    # malformed / NULL json rows: all extracted fields NULL, row survives
    assert got[3]["k"] is None and got[4]["k"] is None
    assert set(got) == {0, 1, 2, 3, 4}


def test_extract_plan_is_narrow_jvm_projection(spark):
    """No Exchange, no Python — metadata extraction must run at scan
    speed inside whole-stage codegen."""
    df = spark.createDataFrame(ROWS * 20, "id: long, props: string")
    out = extract_json_fields(df, "props", fields={"k": "double", "tag": "string"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Python", "BatchEval"):
        assert bad not in plan, plan


def test_explicit_fields_and_prefix(spark):
    df = spark.createDataFrame(ROWS, "id: long, props: string")
    out = extract_json_fields(
        df, "props", fields={"meta.d": "bigint"}, keep=["id"], prefix="p_"
    )
    assert out.columns == ["id", "p_meta_d"]
    assert out.where("p_meta_d = 9").count() == 1
