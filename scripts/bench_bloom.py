"""Bloom-prefilter decontamination scale evidence (r11): at
sf1/sf10/sf100 documents (50k / 500k / 5M docs), run decontaminate
with a LARGE probe set (every doc_id % 5 == 0 — 20% of the corpus, so
the probe's distinct-shingle set is millions of strings, the regime
the bloom lane exists for) through both methods and record:

- wall-clock (min of 2, noop-materialized) for broadcast vs bloom;
- the sizes that motivate the trade: distinct probe shingles, their
  summed string bytes (the payload a broadcast hash relation must
  ship, before JVM object overhead) vs the bloom bitmap bytes;
- equality of the two results (count + id-sum must match exactly —
  the no-false-negatives + verify-join contract at scale).

Usage: python scripts/bench_bloom.py [out_json]   # run SOLO
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

SFS = {
    "sf1": "/root/repo/.scratch/sf1",
    "sf10": "/root/repo/.scratch/sf10",
    "sf100": "/root/repo/.scratch/sf100",
}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import _load_sentinel
    from pydiverse_transform_spark.extras import dedup
    from pydiverse_transform_spark.extras.bloom import bloom_build

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-bloom")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        # the broadcast lane must actually broadcast the probe relation
        # at every sf (that IS the method under test); 1g ceiling keeps
        # it honest-but-runnable locally
        .config("spark.sql.autoBroadcastJoinThreshold", str(1 << 30))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {"sentinel_start": _load_sentinel(), "probe": "doc_id % 5 = 0"}
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            print(f"  {tag}: corpus missing, skipped", flush=True)
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        probe = docs.filter(F.col("doc_id") % 5 == 0)
        row = {"n_docs": docs.count()}

        # size the trade: distinct probe shingles + payload bytes
        probe_sh = (
            probe.select(F.explode(
                dedup.word_shingles(F.col("text"), 3)).alias("s"))
            .distinct()
        )
        sz = probe_sh.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("s")).alias("bytes")).collect()[0]
        row["probe_shingles"] = int(sz["n"])
        row["probe_string_bytes"] = int(sz["bytes"])
        bf = bloom_build(probe_sh, "s", n_items=int(sz["n"]), fpp=0.01)
        row["bloom_bitmap_bytes"] = bf.n_bytes
        row["bloom_n_hashes"] = bf.n_hashes

        checks = {}
        for method in ("broadcast", "bloom"):
            times = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                out = dedup.decontaminate(docs, probe, method=method)
                agg = out.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("doc_id").cast("long").alias("s")).collect()[0]
                times.append(time.time() - t0)
            checks[method] = (int(agg["n"]), int(agg["s"]))
            row[f"decontaminate_{method}_sec"] = round(min(times), 3)
        row["results_equal"] = checks["broadcast"] == checks["bloom"]
        row["n_clean"] = checks["broadcast"][0]
        assert row["results_equal"], f"{tag}: {checks}"
        results[tag] = row
        print(f"  {tag}: {json.dumps(row)}", flush=True)

    results["sentinel_end"] = _load_sentinel()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
