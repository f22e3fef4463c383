"""Per-query profiling: split each bench query's wall clock into BUILD
(the queries()[name](spark, sf_dir) call — DSL translation plus any
eager actions it performs) and EXEC (the noop write), and count the
Spark jobs each phase launches (statusTracker job-id delta).

A query whose exec is dominated by many short jobs is paying the
~0.2-0.3 s/job scheduling floor, not compute; one long job means real
work.  Usage:

    python scripts/profile_queries.py [--runs N] [query ...]

Prints one JSON line per query plus a total; identical session config
to bench.py so numbers are comparable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES

    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = args or BENCH_QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pdt-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.warehouse.dir",
                os.path.join(here, ".tmp_stream", "warehouse"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()

    def njobs():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    # warm
    qs["q01_pricing_summary"](spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()

    total_best = 0.0
    rows = []
    for name in names:
        best = None
        for _ in range(runs):
            j0 = njobs()
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            j1 = njobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = njobs()
            rec = {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "build_jobs": j1 - j0,
                "exec_jobs": j2 - j1,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        rows.append(best)
        total_best += best["total_s"]
        print(json.dumps(best), flush=True)
    print(json.dumps({"total_best_s": round(total_best, 3),
                      "n_queries": len(rows)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
