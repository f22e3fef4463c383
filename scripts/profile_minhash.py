"""Stage-split profile of the minhash near-dup pipeline at sf1.

q_dedup_minhash has the steepest measured scaling slope (3.5x/decade,
SCALE.md) of the data-bound pipelines.  This splits its wall-clock into
cumulative stages so the dominant cost is measured, not guessed:

  1. shingle      — tokenize + build k-word shingle arrays
  2. base_hash    — + md5-derived 32-bit hash per shingle
  3. signature    — + 16-wide one-pass minhash fold
  4. band_join    — + band hashing, explode, self-equi-join, distinct
  5. verify       — + exact Jaccard on candidate pairs (full pipeline)

Each stage timing forces full evaluation of everything up to that stage
(sums over the produced arrays/counts — nothing collected to the
driver).  Stage cost = delta between consecutive rows.

Usage: python scripts/profile_minhash.py [sf_dir]
Prints one JSON line.  Run SOLO — concurrent sessions inflate timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup as dd

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-minhash")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    n_docs = docs.count()

    def timed(fn):
        t0 = time.time()
        out = fn()
        return time.time() - t0, out

    results = {}

    # 1. shingle
    t, v = timed(lambda: dd.shingled(docs).select(
        F.sum(F.array_size("__sh"))).collect()[0][0])
    results["shingle"] = {"sec": round(t, 3), "total_shingles": int(v)}

    # 2. + base hash
    sh = dd.shingled(docs)
    t, v = timed(lambda: sh.select(
        F.sum(F.aggregate(dd.shingle_base_hash(F.col("__sh")),
                          F.lit(0).cast("long"), lambda a, h: a + h))
    ).collect()[0][0])
    results["base_hash"] = {"sec": round(t, 3)}

    # 3. + signature fold
    t, v = timed(lambda: sh.select(
        F.sum(F.aggregate(
            dd.minhash_signature_array(
                dd.shingle_base_hash(F.col("__sh")), 16),
            F.lit(0).cast("long"), lambda a, h: a + h))
    ).collect()[0][0])
    results["signature"] = {"sec": round(t, 3)}

    # 4. + band join (candidate pairs)
    t, v = timed(lambda: dd.lsh_candidate_pairs(docs).count())
    results["band_join"] = {"sec": round(t, 3), "pairs": int(v)}

    # 5. full pipeline with Jaccard verify
    t, v = timed(lambda: dd.minhash_dedup_pairs(docs).count())
    results["verify_full"] = {"sec": round(t, 3), "dup_pairs": int(v)}

    print(json.dumps({"sf_dir": sf, "n_docs": n_docs, "stages": results}))
    spark.stop()


if __name__ == "__main__":
    main()
