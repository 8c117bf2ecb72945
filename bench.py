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

    # Idle-host protocol (VERDICT r7: a run labeled uncontended carried
    # loadavg ~7.9 and a 4.2x canary spread — moderate contention hides
    # below the >2.5x canary trip): record the 1-minute loadavg at start,
    # and optionally wait for the host to go idle first.
    # SPARK_GRAFT_WAIT_IDLE=<seconds> caps the wait (0 = don't wait).
    wait_budget = float(os.environ.get("SPARK_GRAFT_WAIT_IDLE", "0"))
    deadline = time.time() + wait_budget
    while os.getloadavg()[0] >= 1.0 and time.time() < deadline:
        time.sleep(5)
    loadavg_start = round(os.getloadavg()[0], 2)

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

    def run_one(fn) -> float:
        t1 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t1, 3)
        # measurement isolation (r11): localCheckpoint blocks are only
        # released when Python GC drops the DataFrame handles — without
        # this, block-manager debris from earlier rows inflates LATE
        # rows (the r11 canary rose 0.25 -> 0.78 s over 122 queries and
        # the final three queries read 2-4x their fresh-session cost).
        # The collect runs OUTSIDE the timed region; queries share no
        # intended state.
        import gc

        del df
        gc.collect()
        return dt

    # contention canary (VERDICT r2: a co-tenant arriving mid-run poisoned
    # BENCH_r02 by 7-21x on unchanged queries): the cheapest stable query
    # is re-run between every few heavy ones; if any canary sample blows
    # past the first by >2.5x, the run records itself as contended so a
    # poisoned bench is self-flagging instead of silently committed.
    canary_fn = qs.get("dedup_exact")
    canary_samples: list = []
    loadavg: dict = {}

    def sample_canary() -> None:
        if canary_fn is not None:
            canary_samples.append(run_one(canary_fn))
            spark.catalog.clearCache()

    sample_canary()
    times: dict = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # min-of-N per query: co-tenant contention on this host arrives and
    # leaves mid-run (r02 recorded 7-21x inflation on unchanged queries;
    # two consecutive "clean" r03 runs each inflated a *different* subset
    # 4-6x), so a single shot is noise-dominated. The minimum of two
    # back-to-back shots is the honest estimate of the query's cost —
    # both are full real executions with caches cleared in between.
    for i, (name, fn) in enumerate(qs.items()):
        try:
            best = None
            for _ in range(max(reps, 1)):
                t = run_one(fn)
                spark.catalog.clearCache()  # no cross-rep cache reuse
                best = t if best is None else min(best, t)
            # sub-second rows are the only ones a rare driver-side stall
            # (~0.2-1.0 s, query-independent, ~1 in 15 executions — the
            # r13-r16 scan_limit "flutter") can push past a 2x ratio;
            # one extra rep makes min() robust to a single strike at
            # negligible added wall-clock (the row is sub-second)
            if best is not None and best < 1.5 and reps >= 2:
                t = run_one(fn)
                spark.catalog.clearCache()
                best = min(best, t)
            times[name] = best
        except Exception as e:  # a failing query must not hide the rest
            times[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
        loadavg[name] = round(os.getloadavg()[0], 2)
        spark.catalog.clearCache()  # no cross-query cache/memory interference
        if (i + 1) % 10 == 0:
            sample_canary()
    sample_canary()

    base = canary_samples[0] if canary_samples else 0.0
    contended = bool(base > 0 and max(canary_samples) > 2.5 * max(base, 0.2))
    total = round(sum(v for v in times.values() if v >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full detail (3-decimal times, per-query loadavg, canary trace) goes
    # to a side file; stdout carries ONE compact JSON line that MUST stay
    # under ~1950 chars — the driver parses it from a 2000-char stdout
    # tail buffer, and the oversized r03/r04 lines were recorded as
    # `parsed: null`. Precision degrades gracefully before anything is
    # dropped, and nothing is lost: the detail file has it all.
    detail = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "load_sec": load_sec,
        "n_queries": len(times),
        "canary_sec": canary_samples,
        "loadavg_start": loadavg_start,
        "loadavg_1m": loadavg,
        "contended": contended,
        "reps": reps,
        "extra_rep_subsecond": reps >= 2,  # min-of-(reps+1) for rows < 1.5 s
        "agg": "min",
    }
    # Default the detail file to a SCRATCH path so driver-initiated
    # (possibly load-contended) runs never overwrite the committed
    # idle-host artifact in the working tree (VERDICT r13 #4 / next #9).
    # An idle-host run that SHOULD be committed sets
    # SPARK_GRAFT_DETAIL=BENCH_DETAIL.json explicitly.
    detail_path = os.environ.get("SPARK_GRAFT_DETAIL", "/tmp/BENCH_DETAIL.json")
    if not os.path.isabs(detail_path):
        detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_path)
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass

    def line_for(ndigits: int, extras: bool) -> str:
        payload = {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, ndigits) for k, v in times.items()},
            "sf": sf_val,
        }
        if extras:
            payload.update(
                {
                    "load_sec": load_sec,
                    "contended": contended,
                    "loadavg_start": loadavg_start,
                    "detail": detail_path,
                }
            )
        return json.dumps(payload, separators=(",", ":"))

    out = line_for(2, True)
    for nd, ex in ((2, False), (1, False)):
        if len(out) <= 1950:
            break
        out = line_for(nd, ex)
    if len(out) > 1950:
        # last resort: fold the cheapest queries into one aggregate key so
        # the line always parses; per-query numbers remain in the detail file
        kept: dict = {}
        for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
            kept[k] = round(v, 1)
            if len(json.dumps(kept, separators=(",", ":"))) > 1700:
                kept.pop(k)
        kept["_folded_rest_sum"] = max(round(total - sum(kept.values()), 1), 0.0)
        out = json.dumps(
            {"metric": "total_query_sec", "value": total, "unit": "sec", "queries": kept, "sf": sf_val},
            separators=(",", ":"),
        )
    print(out)


if __name__ == "__main__":
    main()
