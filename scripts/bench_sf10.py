"""Two-decade scaling curve (r9, VERDICT r8 next #3): time the r8
steepest-slope headline queries at sf0.1 / sf1 / sf10 and report the
per-decade slopes, separating job floor from genuine super-linearity.

The r8 sweep measured sf0.1 -> sf1 slopes of 2.4-3.3x/decade for
q_cosine_topk, q03, q13, q_asof_join, q_interval_join and
q_temperature_mix — all floor-plausible at ~1 s absolutes, but only a
second decade can tell: a floor-dominated query's slope RISES toward
its true data-bound slope as the floor amortizes, and a genuinely
super-linear plan's slope rises PAST it.  Healthy = slope(sf1->sf10)
<= ~linear (10x/decade) with no super-linear mechanism; the r8 verdict
gate is slope(sf1->sf10) <= ~1.3x of slope(sf0.1->sf1) OR a root-caused
fix.  q_semdedup_kprop rides along for the r8 next #4 gate
(k-proportional sizing => slope <= ~3x/decade).

Usage: python scripts/bench_sf10.py [out_json]
Corpora: /root/testdata/sf0.1 plus .scratch/sf1 and .scratch/sf10 from
scripts/gen_scale_corpus.py (factors 10 / 100, all tables).  Run SOLO.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

QUERIES = [
    "q_cosine_topk",
    "q03_shipping_priority",
    "q13_customer_distribution",
    "q_asof_join",
    "q_interval_join",
    "q_temperature_mix",
    "q_semdedup_kprop",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scratch/sf1"),
    ("sf10", "/root/repo/.scratch/sf10"),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import _load_sentinel

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-sf10")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    sent_start = _load_sentinel()

    def run(name, sf_dir, n_runs=2):
        best = None
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    # warm the session (codegen/classloading) once on a small query
    qs[QUERIES[0]](spark, SFS[0][1]).write.format("noop") \
        .mode("overwrite").save()

    result = {}
    for name in QUERIES:
        row = {}
        for tag, sf_dir in SFS:
            row[tag] = run(name, sf_dir)
        row["slope_01_to_1"] = round(row["sf1"] / row["sf0.1"], 2)
        row["slope_1_to_10"] = round(row["sf10"] / row["sf1"], 2)
        result[name] = row
        print(f"  {name}: {row}", file=sys.stderr)

    sent_end = _load_sentinel()
    payload = {
        "metric": "two_decade_scaling",
        "note": ("min-of-2 per (query, sf), noop sink, cache cleared "
                 "between runs; sf1/sf10 corpora are gen_scale_corpus "
                 "replicas (self-contained per-replica TPC-H keys, "
                 "word-permuted documents, fresh-id events/embeddings)"),
        "cpus": int(CPUS),
        "sentinel": {"start": sent_start, "end": sent_end},
        "queries": result,
    }
    spark.stop()
    line = json.dumps(payload)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
