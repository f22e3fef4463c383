"""Scaling evidence for the persisted MinHash-LSH index
(extras/dedup.py write_minhash_index / minhash_index_lookup /
neardup_filter_new): index build cost is one corpus map pass, while
per-increment lookup latency stays ~flat as the corpus grows — the
reason incremental ingest dedup probes a persisted bucket table
instead of re-running the batch LSH corpus-wide (whose candidate
volume additionally explodes quadratically inside replica groups).

Usage: python scripts/bench_minhash_index.py [out_json]
Needs the scale corpora from scripts/gen_scale_corpus.py at
.scratch/sf1 (50k docs) and .scratch/sf10 (500k docs); sf0.1 testdata
is always included.  Prints one JSON object and writes it to out_json
(default MINHASH_INDEX_r08.json).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

CORPORA = [
    ("/root/testdata/sf0.1/documents.parquet", 20, "5k"),
    ("/root/repo/.scratch/sf1/documents.parquet", 20, "50k"),
    ("/root/repo/.scratch/sf10/documents.parquet", 200, "500k"),
    # r9 soak decade (VERDICT r8 stretch #9): ~1.8 GB bucket table —
    # past the point where it lives in page cache alongside the shuffle
    # working set, which is exactly what the flat-lookup claim must
    # survive.  gen_scale_corpus.py 1000 ... sf100 documents
    ("/root/repo/.scratch/sf100/documents.parquet", 2000, "5m"),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MINHASH_INDEX_r08.json"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mn3(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            f()
            best = min(best, time.time() - t0)
        return round(best, 3)

    rows = {}
    for src, mod, tag in CORPORA:
        if not os.path.exists(src):
            rows[tag] = {"skipped": f"missing {src}"}
            continue
        docs = spark.read.parquet(src)
        corpus = docs.filter(F.col("doc_id") % mod != 0)
        inc = docs.filter(F.col("doc_id") % mod == 0)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scratch", f"bench_mhidx_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        dedup.write_minhash_index(corpus, path)
        t_build = round(time.time() - t0, 3)
        rows[tag] = {
            "corpus_docs": corpus.count(),
            "increment_docs": inc.count(),
            "index_bytes_du": subprocess.run(
                ["du", "-sb", path], capture_output=True, text=True,
            ).stdout.split()[0],
            "build_sec": t_build,
            # governors="off" pins the lane to r12 semantics (the r13
            # auto default adds a projection job; its soak row is
            # lookup_auto_sec)
            "lookup_sec": mn3(lambda: dedup.minhash_index_lookup(
                spark, path, inc, threshold=0.45,
                governors="off").count()),
            "lookup_auto_sec": mn3(
                lambda: dedup.minhash_index_lookup(
                    spark, path, inc, threshold=0.45).count()),
            # r10 governors (VERDICT r9 next #2): same probe with the
            # candidate-volume bounds on — the number that must stay
            # bounded when near-dup density, not corpus size, explodes
            # the raw candidate count
            "lookup_governed_sec": mn3(
                lambda: dedup.minhash_index_lookup(
                    spark, path, inc, threshold=0.45, min_bands=2,
                    top_k=10).count()),
            "candidates_raw": dedup.minhash_index_lookup(
                spark, path, inc, threshold=0.0,
                governors="off").count(),
            "candidates_min_bands2": dedup.minhash_index_lookup(
                spark, path, inc, threshold=0.0, min_bands=2).count(),
            "hits_governed": dedup.minhash_index_lookup(
                spark, path, inc, threshold=0.45, min_bands=2,
                top_k=10).count(),
            "filter_new_sec": mn3(lambda: dedup.neardup_filter_new(
                spark, path, inc, threshold=0.45).count()),
        }
        shutil.rmtree(path, ignore_errors=True)

    result = {"metric": "minhash_index_scaling", "corpora": rows,
              "cpus": CPUS}
    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
