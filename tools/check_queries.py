"""Side-by-side Spark-vs-DuckDB check of selected queries() entries,
mimicking the driver's correctness gate (rows + schema + value hash on
name-sorted columns). Usage:

    python tools/check_queries.py [sf_dir] [query ...]

No args = every oracled query.
"""

from __future__ import annotations

import hashlib
import os
import sys


def _hash_df(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(tuple(str(v) for v in r) for r in pdf.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[2:] or [n for n in qs if n in oracles]
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            ok_rows = len(sdf) == len(odf)
            ok_cols = sorted(sdf.columns) == sorted(odf.columns)
            ok_hash = ok_rows and ok_cols and _hash_df(sdf) == _hash_df(odf)
            status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            print(f"{status} {name}: spark={len(sdf)} oracle={len(odf)} cols={ok_cols} hash={ok_hash}")
            if status == "FAIL":
                failed.append(name)
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
    print("FAILED:", failed if failed else "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
