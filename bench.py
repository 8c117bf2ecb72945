"""Benchmark runner: every __spark_entry__ query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "load_sec": ...}

Warehouse bootstrap (engine-table loads + mutation scenarios) is timed
separately as load_sec; per-query numbers measure scan/plan/execute via
Spark's noop sink (full materialization, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("iceberg_python_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    t0 = time.time()
    entry._wh(spark, sf_dir)  # bootstrap once, outside query timing
    load_sec = round(time.time() - t0, 2)

    qs = entry.queries()
    times: dict = {}
    for name, fn in qs.items():
        t1 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t1, 3)
        except Exception as e:  # a failing query must not hide the rest
            times[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
        spark.catalog.clearCache()  # no cross-query cache/memory interference

    total = round(sum(v for v in times.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load_sec": load_sec,
                "n_queries": len(times),
            }
        )
    )


if __name__ == "__main__":
    main()
