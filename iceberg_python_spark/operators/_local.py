"""Small driver-side row sets as Arrow-backed local relations.

``spark.createDataFrame(list_of_tuples, schema)`` compiles to a
``parallelize`` Python RDD with ``defaultParallelism`` slices: every
materialization of any plan containing it round-trips through that many
Python worker tasks (measured ~0.4-5s per evaluation on local[32] for a
ONE-row frame). Routing the same rows through a pandas frame takes the
Arrow conversion path instead, which lands in the JVM as a plain local
relation — zero Python work at execution time (guide §4: keep tiny
driver-side rows off the Python boundary).

Falls back to the row path when Arrow conversion is unavailable (e.g.
a session without pyarrow); results are identical either way.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows: Sequence[Iterable], schema) -> DataFrame:
    """Build a DataFrame from a small driver-side list of row tuples.

    ``schema`` is a DDL string or StructType; columns map positionally,
    exactly like ``createDataFrame(rows, schema)``."""
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame([list(r) for r in rows], dtype=object)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame([tuple(r) for r in rows], schema)
