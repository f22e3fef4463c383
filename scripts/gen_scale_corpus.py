"""Generate a deterministic N-fold (default 10x ~= sf1) scale-up of the
documents and events tables for the scaling-curve benchmark
(scripts/bench_scale.py) — the two tables behind the data-bound
pipelines (MinHash-LSH dedup / corpus near-dup, scalable sessionize).

Design (matters for honesty of the measurement):

- documents: replica 0 is the original corpus verbatim; replicas 1..N-1
  get a fresh doc_id range and WORD-PERMUTED text (per-(doc, replica)
  xxhash64 seed, pure codegen array expressions).  Permutation preserves
  length/vocabulary (so shingle counts and LSH bucket-size distribution
  scale realistically) but destroys word-n-gram similarity, so replicas
  do NOT form artificial near-dup cliques with their originals — true
  near-dup pairs stay those of the original corpus, candidate volume
  scales with data.  Replicating text verbatim instead would create
  N-cliques and inflate pair counts ~N^2, benchmarking a different
  (easier to look good on) workload.
- events: replicas get fresh user_id / event_id ranges with timestamps
  unchanged — user count scales N-fold, per-user event volume and time
  span stay constant, which is exactly the axis the scalable sessionize
  claims to be linear in.

Usage:
    python scripts/gen_scale_corpus.py [factor] [src_sf_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DOC_ID_STRIDE = 100_000_000
USER_ID_STRIDE = 100_000_000
EVENT_ID_STRIDE = 1_000_000_000


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scratch/sf1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("gen-scale-corpus")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    # tokenize exactly like extras/text.tokens() (trim + split on \s+)
    # so replica shingle/token distributions match the original corpus
    permuted_text = F.expr(
        "array_join(transform(array_sort(transform("
        r"split(regexp_replace(text, '^\\s+|\\s+$', ''), '\\s+'), "
        "(w, i) -> named_struct("
        "'h', xxhash64(w, i, doc_id, __replica), 'w', w))), "
        "s -> s.w), ' ')"
    )
    scaled_docs = (
        docs.withColumn(
            "__replica",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))),
        )
        .withColumn(
            "text",
            F.when(F.col("__replica") == 0, F.col("text"))
            .otherwise(permuted_text),
        )
        .withColumn(
            "doc_id",
            F.col("doc_id")
            + F.col("__replica").cast("long") * F.lit(DOC_ID_STRIDE),
        )
        .withColumn("n_chars", F.length("text"))
        .drop("__replica")
    )
    scaled_docs.repartition(int(CPUS)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    events = spark.read.parquet(f"{src}/events.parquet")
    scaled_events = (
        events.withColumn(
            "__replica",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))),
        )
        .withColumn(
            "user_id",
            F.col("user_id")
            + F.col("__replica").cast("long") * F.lit(USER_ID_STRIDE),
        )
        .withColumn(
            "event_id",
            F.col("event_id")
            + F.col("__replica").cast("long") * F.lit(EVENT_ID_STRIDE),
        )
        .drop("__replica")
    )
    scaled_events.repartition(int(CPUS)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )

    nd = spark.read.parquet(f"{out}/documents.parquet").count()
    ne = spark.read.parquet(f"{out}/events.parquet").count()
    spark.stop()
    print(f"wrote {out}: documents={nd} events={ne} (factor {factor})")


if __name__ == "__main__":
    main()
