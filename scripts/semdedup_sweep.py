"""SemDeDup threshold sweep (r7 stretch): dedup rate is threshold-
sensitive (Abbas et al. 2023 tune it per corpus); publish kept-fraction
and CONTENT COVERAGE per threshold so the operator ships with tuning
guidance instead of a magic 0.95.

Corpus: the sf1 scale-up (.scratch/sf1/embeddings.parquet), which by
construction contains 10 jittered replicas of each base vector
(gen_scale_corpus.py: ±1% deterministic jitter) — a known ground truth
for semantic near-duplication.  The two honest quality axes:

- kept_fraction: rows surviving semdedup / total (the dedup rate).
- coverage: distinct base contents still represented after dedup /
  total base contents (base id = vec_id % VEC_ID_STRIDE).  A correct
  threshold collapses replica groups (kept_fraction -> ~1/replicas)
  while coverage stays 1.0 — dropping coverage means the threshold is
  merging genuinely DIFFERENT contents (over-dedup, the failure mode
  that silently deletes long-tail data at 100 TB).

Usage: python scripts/semdedup_sweep.py [sf1_dir] [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
VEC_ID_STRIDE = 100_000_000
THRESHOLDS = [0.999, 0.99, 0.95, 0.90]
K_CELLS = 64


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("semdedup-sweep")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf1}/embeddings.parquet")
    n_total = emb.count()
    n_base = emb.select(
        (F.col("vec_id") % VEC_ID_STRIDE).alias("b")).distinct().count()

    cents = sim.kmeans_fit(emb, k=K_CELLS, n_iter=5, dim=64)
    rows = []
    # r8: price the margin-pruned multi-probe (probe_margin='auto',
    # the new default) against unconditional probing (None) — the
    # boundary-coverage fix must cost <= 2x the n_probe=1 baseline,
    # not r7's ~6x
    for th, n_probe, margin in ([(t, 1, None) for t in THRESHOLDS]
                                + [(0.95, 2, None), (0.95, 2, "auto")]):
        t0 = time.perf_counter()
        kept = sim.semdedup(emb, cents, threshold=th,
                            n_probe=n_probe,
                            probe_margin=margin).select(
            "vec_id", (F.col("vec_id") % VEC_ID_STRIDE).alias("b"))
        agg = kept.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("b").alias("cov")).collect()[0]
        el = round(time.perf_counter() - t0, 1)
        rows.append({
            "threshold": th,
            "n_probe": n_probe,
            "probe_margin": margin,
            "kept_rows": int(agg["n"]),
            "kept_fraction": round(int(agg["n"]) / n_total, 4),
            "coverage": round(int(agg["cov"]) / n_base, 4),
            "sec": el,
        })
        print(json.dumps(rows[-1]))
    spark.stop()
    out = {"corpus": sf1, "n_total": n_total, "n_base": n_base,
           "replicas": round(n_total / n_base, 1), "k_cells": K_CELLS,
           "sweep": rows}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
