"""Data-quality expectations over DataFrames (the deequ/
great-expectations primitive): declarative per-column constraints
checked in ONE aggregation pass, returning a machine-readable report.

Training pipelines gate every ingest batch on exactly this — "keys
unique, no null ids, values in range, foreign keys resolve" — before
the batch is allowed to merge; the report row is what lands in the
run ledger. The reference has no counterpart (published-recipe
operator: Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018).

Spark shape (100 TB): every non-relational rule compiles to ONE
aggregate expression, so the whole rule set is a single map-side-
combinable pass over the data — no shuffle beyond the final
aggregation, no per-rule scan. ``unique`` needs a distinct count
(one shuffle on the key columns); ``contained_in`` (referential
containment) is a LEFT ANTI count against the reference keys
(broadcast when small, AQE decides). Rules never fail the job — the
report carries per-rule violation counts and the caller decides.

Rule forms (``rules`` is a list of dicts)::

    {"rule": "not_null",     "column": "o_custkey"}
    {"rule": "unique",       "columns": ["o_orderkey"]}
    {"rule": "min",          "column": "o_totalprice", "value": 0}
    {"rule": "max",          "column": "l_discount",   "value": 1}
    {"rule": "in_set",       "column": "o_orderstatus", "values": ["F","O","P"]}
    {"rule": "matches",      "column": "o_orderpriority", "pattern": "^[1-5]-"}
    {"rule": "contained_in", "columns": ["o_custkey"], "ref": dim_df,
     "ref_columns": ["c_custkey"]}
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

from iceberg_python_spark.operators._local import local_rows_df
from pyspark.sql import DataFrame, functions as F

__all__ = ["check_expectations"]

_SIMPLE = ("not_null", "min", "max", "in_set", "matches")


def _violation_expr(rule: Dict[str, Any]):
    kind = rule["rule"]
    c = F.col(rule["column"])
    if kind == "not_null":
        return c.isNull()
    if kind == "min":
        return c.isNotNull() & (c < F.lit(rule["value"]))
    if kind == "max":
        return c.isNotNull() & (c > F.lit(rule["value"]))
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown rule {kind!r}")


def _rule_name(rule: Dict[str, Any]) -> str:
    kind = rule["rule"]
    cols = rule.get("columns") or [rule.get("column")]
    return f"{kind}({','.join(map(str, cols))})"


def check_expectations(df: DataFrame, rules: Sequence[Dict[str, Any]]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; one report row per rule:
    ``(rule, violations, n_rows, passed)``. Deterministic and
    SQL-reproducible — violation counts are plain conditional
    aggregates."""
    if not rules:
        raise ValueError("check_expectations needs at least one rule")
    spark = df.sparkSession
    simple = [r for r in rules if r["rule"] in _SIMPLE]
    others = [r for r in rules if r["rule"] not in _SIMPLE]
    for r in others:
        if r["rule"] not in ("unique", "contained_in"):
            raise ValueError(f"unknown rule {r['rule']!r}")

    reports: List[DataFrame] = []
    # one pass computes n_rows AND every simple rule's violation count
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, r in enumerate(simple):
        # coalesce: SUM over ZERO rows is NULL — an empty ingest batch
        # is exactly when a quality gate runs, and it must report
        # 0 violations, not crash on int(None) (ADVICE r14 #3)
        aggs.append(
            F.coalesce(F.sum(F.when(_violation_expr(r), 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"_v{i}")
        )
    row = df.agg(*aggs).collect()[0]
    n_rows = int(row["_n"])
    rows = [
        (_rule_name(r), int(row[f"_v{i}"]), n_rows, int(row[f"_v{i}"]) == 0)
        for i, r in enumerate(simple)
    ]
    if rows:
        reports.append(
            local_rows_df(
                spark, rows, "rule string, violations long, n_rows long, passed boolean"
            )
        )

    for r in others:
        if r["rule"] == "unique":
            keys = list(r["columns"])
            dup = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c")).where(F.col("_c") > 1)
            # violations = rows participating in a duplicate key
            v = int(dup.agg(F.coalesce(F.sum("_c"), F.lit(0))).collect()[0][0])
        else:  # contained_in
            keys = list(r["columns"])
            ref = r["ref"].select(
                *[F.col(rc).alias(k) for k, rc in zip(keys, r["ref_columns"])]
            ).distinct()
            nn = F.lit(True)
            for k in keys:  # SQL FK semantics: null keys never violate
                nn = nn & F.col(k).isNotNull()
            v = df.select(*keys).where(nn).join(ref, keys, "left_anti").count()
        reports.append(
            local_rows_df(
                spark,
                [(_rule_name(r), int(v), n_rows, v == 0)],
                "rule string, violations long, n_rows long, passed boolean",
            )
        )
    out = reports[0]
    for x in reports[1:]:
        out = out.unionByName(x)
    return out
