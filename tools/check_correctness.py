"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query against its DuckDB oracle at a given sf and report
row-count + order-insensitive value matches.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.10g}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm_cell(x) for x in v) + "]"
        if hasattr(v, "isoformat"):
            return v.isoformat().replace("+00:00", "")
        return str(v)

    out = df.apply(lambda col: col.map(norm_cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    t0 = time.time()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            t1 = time.time()
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            dt = time.time() - t1
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                a, b = normalize(spdf), normalize(odf)
                count_ok = len(a) == len(b)
                cols_ok = list(a.columns) == list(b.columns)
                values_ok = count_ok and cols_ok and a.equals(b)
                status = "MATCH" if values_ok else "MISMATCH"
                detail = ""
                if not values_ok:
                    detail = f" spark_rows={len(a)} oracle_rows={len(b)} cols_ok={cols_ok}"
                    if count_ok and cols_ok:
                        diff_mask = (a != b).any(axis=1)
                        idx = list(a.index[diff_mask])[:3]
                        for i in idx:
                            detail += f"\n    spark : {a.loc[i].to_dict()}\n    oracle: {b.loc[i].to_dict()}"
            else:
                status = "ROWS_ONLY"
                detail = f" rows={len(spdf)}"
            print(f"{status:9s} {name:32s} {dt:6.1f}s{detail}")
            results.append((name, status))
        except Exception as e:
            print(f"ERROR     {name:32s} {type(e).__name__}: {str(e)[:200]}")
            results.append((name, "ERROR"))
    bad = [n for n, s in results if s in ("MISMATCH", "ERROR")]
    print(f"\n{len(results)} queries, {len(bad)} failing, total {time.time()-t0:.0f}s")
    if bad:
        print("failing:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
