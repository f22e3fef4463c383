"""Exercise the decontaminate ``method="auto"`` -> bloom crossover
(r13, VERDICT r12 next #5): every committed point so far ROUTED to
broadcast — the 1 GiB ``_BLOOM_AUTO_PROBE_BYTES`` threshold was argued
from bytes/key arithmetic but never fired.  This builds a probe whose
parquet (and therefore Catalyst plan-size estimate — file scans are
sized from the listing) exceeds the threshold, records that
``_resolve_decon_method("auto", probe)`` — the SAME call the shipped
code executes — picks ``bloom``, and runs the routed lane to
completion at the sf100 corpus.

Exactness at this scale is verified with a tiny oracle: the probe is
~2.7M synthetic eval docs whose words ("ev<k>", globally unique) can
NEVER shingle-collide with the corpus, plus 50 REAL corpus docs — so
the full-probe bloom result must equal a broadcast-lane run against
just those 50 docs (which IS broadcastable).  The broadcast lane on
the full probe is deliberately NOT run: a ~260M-string hash relation
is the driver/executor OOM regime the router exists to avoid.

Usage: python scripts/bench_bloom_crossover.py [out_json]   # run SOLO
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF100 = "/root/repo/.scratch/sf100"
PROBE_PATH = "/root/repo/.scratch/bloom_probe_xl.parquet"
# words are md5 hex (33 B, near-incompressible) so the >1 GiB plan
# estimate is reached at ~45M distinct shingles — under bloom_build's
# 1G-bit bitmap cap at fpp=0.01 (the first attempt used "ev<k>" words:
# 2.7M docs compressed 6x on disk and needed 270M shingles, which the
# cap rightly refused)
N_PROBE_DOCS = 450_000


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import _load_sentinel
    from pydiverse_transform_spark.extras import dedup
    from pydiverse_transform_spark.extras.util import plan_size_bytes

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-bloom-crossover")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {"sentinel_start": _load_sentinel()}

    docs = spark.read.parquet(f"{SF100}/documents.parquet")
    row = {"n_docs": docs.count(), "n_probe_docs": N_PROBE_DOCS + 50}

    if not os.path.isdir(PROBE_PATH):
        syn = spark.range(N_PROBE_DOCS).select(
            (F.col("id") + F.lit(1_000_000_000)).alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(0), F.lit(101)),
                lambda i: F.concat(
                    F.lit("ev"),
                    F.md5((F.col("id") * 102 + i).cast("string"))))
            ).alias("text"))
        real50 = (docs.orderBy("doc_id").limit(50)
                  .select((F.col("doc_id") + F.lit(2_000_000_000))
                          .alias("doc_id"), "text"))
        syn.unionByName(real50).write.mode("overwrite") \
            .parquet(PROBE_PATH)
    probe = spark.read.parquet(PROBE_PATH)

    row["probe_parquet_bytes"] = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(PROBE_PATH) for f in fs)
    row["probe_plan_size_bytes"] = plan_size_bytes(probe)
    row["auto_probe_bytes_threshold"] = dedup._BLOOM_AUTO_PROBE_BYTES
    # the exact call the shipped code makes — not a re-derivation
    row["auto_route"] = dedup._resolve_decon_method("auto", probe)
    print(f"  probe: {row['probe_parquet_bytes']} B on disk, plan "
          f"estimate {row['probe_plan_size_bytes']} B -> route "
          f"{row['auto_route']}", flush=True)
    assert row["auto_route"] == "bloom", row

    t0 = time.time()
    out = dedup.decontaminate(docs, probe, method="auto")
    agg = out.agg(F.count(F.lit(1)).alias("n"),
                  F.coalesce(F.sum("doc_id"), F.lit(0))
                  .cast("long").alias("s")).collect()[0]
    row["decontaminate_auto_sec"] = round(time.time() - t0, 3)
    row["n_clean"] = int(agg["n"])

    # tiny-oracle exactness: only the 50 embedded real docs can
    # contaminate, so the broadcast lane against THEM alone must agree
    real50 = probe.filter(F.col("doc_id") >= 2_000_000_000)
    t0 = time.time()
    ora = dedup.decontaminate(docs, real50, method="broadcast")
    oagg = ora.agg(F.count(F.lit(1)).alias("n"),
                   F.coalesce(F.sum("doc_id"), F.lit(0))
                   .cast("long").alias("s")).collect()[0]
    row["oracle_broadcast_50doc_sec"] = round(time.time() - t0, 3)
    row["results_equal"] = ((int(agg["n"]), int(agg["s"]))
                            == (int(oagg["n"]), int(oagg["s"])))
    assert row["results_equal"], (agg, oagg)

    results["auto_crossover_sf100"] = row
    results["sentinel_end"] = _load_sentinel()
    print(f"  auto_crossover_sf100: {json.dumps(row)}", flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
