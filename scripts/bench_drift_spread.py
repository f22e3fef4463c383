"""Adjudicate the r12 quiet-host drift cluster (r13, VERDICT r12 next
#2): q_lm_perplexity, q_cosine_topk, q_temperature_mix and q_semdedup
measured slower than BOTH the r10 and r11 quiet runs, and a min-of-2
round protocol cannot distinguish environment drift from a code
regression at the ±15 % level.

Protocol: one bench.py-identical session (local[32], 32 shuffle
partitions, AQE, 16g driver, q01 warm-up), then FIVE independent
min-of-3 samples per query — each sample is exactly the statistic a
round's BENCH_LOCAL records — interleaved round-robin so slow host
phases spread across queries instead of piling onto one.  The
artifact reports the 5-sample spread next to the committed
r10/r11/r12 quiet values, so each query resolves to `noise` (spread
overlaps the committed range) or `regression` (median sits above
every committed value by > 10 %).

Usage: python scripts/bench_drift_spread.py [out_json]   # run SOLO
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["q_lm_perplexity", "q_cosine_topk", "q_temperature_mix",
           "q_semdedup"]
N_SAMPLES = 5


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import _load_sentinel

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pdt-drift-spread")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.warehouse.dir",
                os.path.join(REPO, ".tmp_stream", "warehouse"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    qs["q01_pricing_summary"](spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()

    results = {"sentinel_start": _load_sentinel(),
               "protocol": f"{N_SAMPLES} x min-of-3 per query, "
                           "round-robin, bench.py session config",
               "sf_dir": SF_DIR}
    samples = {q: [] for q in QUERIES}
    for _ in range(N_SAMPLES):
        for name in QUERIES:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            samples[name].append(round(min(runs), 3))
    results["sentinel_end"] = _load_sentinel()

    committed = {}
    for r in ("r10", "r11", "r12"):
        p = os.path.join(REPO, f"BENCH_LOCAL_{r}.json")
        if os.path.exists(p):
            with open(p) as f:
                t = json.load(f).get("queries") or {}
            for q in QUERIES:
                committed.setdefault(q, {})[r] = t.get(q)

    verdicts = {}
    for q in QUERIES:
        s = samples[q]
        med = statistics.median(s)
        prior = [v for v in committed.get(q, {}).values()
                 if v is not None]
        regression = bool(prior) and all(med > v * 1.10 for v in prior)
        verdicts[q] = {
            "samples": s,
            "median": round(med, 3),
            "min": min(s), "max": max(s),
            "committed_quiet": committed.get(q, {}),
            "verdict": "regression" if regression else "noise",
        }
        print(f"  {q}: {json.dumps(verdicts[q])}", flush=True)
    results["queries"] = verdicts
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
