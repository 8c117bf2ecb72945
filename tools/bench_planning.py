"""Scan-planning / append / pruning benchmark — the three metrics the
reference's own harness watches (BASELINE.md): (a) planning time vs
file count, (b) partitioned-append throughput with stats collection,
(c) pruning effectiveness (files skipped / files total).

Builds a many-file partitioned table from sf0.01 lineitem (one file per
(month, bucket) via maxRecordsPerFile), then times:

- append wall-time + rows/sec (fan-out write + footer stats + commit)
- plan_files() for a partition-aligned filter, a stats-aligned filter,
  and no filter — driver loop AND distributed planner paths
- pruning fraction for each

Prints one JSON line; run standalone, not inside bench.py (it mutates
its own scratch warehouse).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from iceberg_python_spark import SqliteCatalog, spec_from_names
    from iceberg_python_spark.schema import schema_from_spark

    wh = tempfile.mkdtemp(prefix="ips_planbench_")
    cat = SqliteCatalog("planbench", wh, spark)
    raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_rows = raw.count()
    schema = schema_from_spark(raw.schema)
    spec = spec_from_names(schema, ("l_shipdate", "month"), ("l_suppkey", "bucket[8]"))
    t = cat.create_table(
        "db.lineitem_many_files",
        schema,
        partition_spec=spec,
        properties={"write.parquet.max-records-per-file": "1000"},
    )

    t0 = time.time()
    t.append(raw)
    append_sec = round(time.time() - t0, 3)
    t = t.refresh()
    files_total = len(list(t.scan().plan_files()))

    # throughput-shaped append (default file sizing) for a fair rows/sec;
    # the many-files table above deliberately stresses planning, not IO
    tn = cat.create_table("db.lineitem_throughput", schema, partition_spec=spec_from_names(schema, ("l_shipdate", "month")))
    t0 = time.time()
    tn.append(raw)
    append_normal_sec = round(time.time() - t0, 3)

    def plan(row_filter, distributed: bool):
        # the planner switches to the distributed Spark job above
        # read.plan.distributed-threshold manifest entries; 0 forces it
        t.set_properties({"read.plan.distributed-threshold": "0" if distributed else "200000"})
        tt = t.refresh()
        scan = tt.scan(row_filter=row_filter) if row_filter else tt.scan()
        t1 = time.time()
        tasks = list(scan.plan_files())
        return round(time.time() - t1, 3), len(tasks)

    filters = {
        "none": None,
        "partition_aligned": "l_shipdate >= '1996-01-01' and l_shipdate < '1996-04-01'",
        "stats_aligned": "l_quantity > 49.5",
        "point": "l_suppkey = 17 and l_shipdate >= '1996-01-01' and l_shipdate < '1996-02-01'",
    }
    out = {
        "rows": n_rows,
        "files_total": files_total,
        "append_many_files_sec": append_sec,
        "append_normal_sec": append_normal_sec,
        "append_rows_per_sec": round(n_rows / append_normal_sec, 1),
        "plans": {},
    }
    for name, f in filters.items():
        for dist in (False, True):
            key = f"{name}_{'dist' if dist else 'driver'}"
            try:
                sec, n = plan(f, dist)
            except Exception as e:  # noqa: BLE001
                out["plans"][key] = {"err": f"{type(e).__name__}: {str(e)[:80]}"}
                continue
            out["plans"][key] = {
                "sec": sec,
                "files_matched": n,
                "pruned_frac": round(1 - n / max(files_total, 1), 4),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
