

def test_scalar_quantization_exact_and_bounded(spark):
    """quantize_embeddings: codes are floor((v-lo)*scale+0.5) exactly,
    dequantization error <= half a step per element, constant dims
    quantize to 0, and levels validate."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from iceberg_python_spark.operators.similarity import (
        dequantize_col,
        quantize_embeddings,
    )

    rows = [
        (1, [0.0, 5.0, -2.0, 7.5]),
        (2, [1.0, 5.0, 2.0, -7.5]),
        (3, [0.5, 5.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    qdf, mins, maxs = quantize_embeddings(df, "vec", "vec_id")
    got = {r["vec_id"]: list(r["q"]) for r in qdf.collect()}
    assert mins == [0.0, 5.0, -2.0, -7.5] and maxs == [1.0, 5.0, 2.0, 7.5]
    for vid, vec in rows:
        for j, v in enumerate(vec):
            if maxs[j] == mins[j]:
                want = 0
            else:
                want = math.floor((v - mins[j]) * (255.0 / (maxs[j] - mins[j])) + 0.5)
            assert got[vid][j] == want, (vid, j)
    deq = qdf.select("vec_id", dequantize_col(F.col("q"), mins, maxs).alias("dv"))
    dd = {r["vec_id"]: list(r["dv"]) for r in deq.collect()}
    for vid, vec in rows:
        for j, v in enumerate(vec):
            step = 0.0 if maxs[j] == mins[j] else (maxs[j] - mins[j]) / 255.0
            # constant dims dequantize to lo exactly
            assert abs(dd[vid][j] - v) <= step / 2 + 1e-12, (vid, j)
    with pytest.raises(ValueError, match="levels"):
        quantize_embeddings(df, "vec", "vec_id", levels=1)
