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
    python scripts/gen_scale_corpus.py [factor] [src_sf_dir] [out_dir] [tables]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sf1
          documents,events,embeddings
`tables` selects which tables to (re)generate, so e.g. an
embeddings-only 100x set for the quantizer scaling curve doesn't pay
for re-permuting the document corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DOC_ID_STRIDE = 100_000_000
USER_ID_STRIDE = 100_000_000
EVENT_ID_STRIDE = 1_000_000_000
VEC_ID_STRIDE = 100_000_000


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scratch/sf1"
    tables = set(
        (sys.argv[4] if len(sys.argv) > 4 else "documents,events,embeddings")
        .split(",")
    )

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

    if "documents" in tables:
        _gen_documents(spark, F, src, out, factor)
    if "events" in tables:
        _gen_events(spark, F, src, out, factor)
    if "embeddings" in tables:
        _gen_embeddings(spark, F, src, out, factor)
    if "tpch" in tables:
        _gen_tpch(spark, F, src, out, factor)
        tables.discard("tpch")
        tables.update(TPCH_TABLES)

    counts = " ".join(
        f"{t}={spark.read.parquet(f'{out}/{t}.parquet').count()}"
        for t in sorted(tables)
    )
    spark.stop()
    print(f"wrote {out}: {counts} (factor {factor})")


def _gen_documents(spark, F, src, out, factor):
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


TPCH_TABLES = ["lineitem", "orders", "customer", "supplier", "part",
               "region", "nation"]

# every foreign key strided identically per replica, so each replica is
# a SELF-CONTAINED copy of the sf0.1 instance: orders->lineitem,
# customer->orders, part/supplier->lineitem all join within the replica
# (TPC-H's own scale-up grows the same way: more keys, same structure).
# region/nation are fixed dimensions — copied verbatim, every replica
# references the same 25 nations, exactly like real TPC-H at any SF.
_TPCH_KEY_STRIDE = 1_000_000_000
_TPCH_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}


def _gen_tpch(spark, F, src, out, factor):
    for t in ("region", "nation"):
        spark.read.parquet(f"{src}/{t}.parquet").write \
            .mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t, keys in _TPCH_KEYS.items():
        # repartition the SMALL source BEFORE exploding: the explode
        # multiplies rows factor-x, so partitioning afterwards shuffles
        # the full post-explode volume through however few tasks the
        # source file had (at factor 1000 lineitem that is one task
        # writing a ~25 GB shuffle — observed wedged for 25+ min in
        # r10).  Partitioning the pre-explode rows costs a shuffle of
        # the ORIGINAL table only and the explode + write then run
        # factor-parallel with no further exchange.
        df = spark.read.parquet(f"{src}/{t}.parquet") \
            .repartition(int(CPUS)).withColumn(
            "__replica",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))),
        )
        for k in keys:
            df = df.withColumn(
                k,
                F.col(k).cast("long")
                + F.col("__replica").cast("long") * F.lit(_TPCH_KEY_STRIDE),
            )
        df.drop("__replica").write \
            .mode("overwrite").parquet(f"{out}/{t}.parquet")


def _gen_events(spark, F, src, out, factor):
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


def _gen_embeddings(spark, F, src, out, factor):
    # embeddings: replicas get fresh vec_id ranges and a small
    # deterministic per-(vec, replica, dim) jitter (±1% of the unit
    # scale, xxhash64-derived, pure codegen) — preserves the label/
    # cluster structure (so quantizer quality stays comparable) while
    # making every replica a distinct vector, not an exact duplicate
    # that k-means would collapse for free.
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    jittered = F.expr(
        "transform(embedding, (v, i) -> cast(v + "
        "(pmod(xxhash64(vec_id, __replica, i), 1000) / 1000.0 - 0.5) * 0.02 "
        "as float))"
    )
    scaled_emb = (
        emb.withColumn(
            "__replica",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))),
        )
        .withColumn(
            "embedding",
            F.when(F.col("__replica") == 0, F.col("embedding"))
            .otherwise(jittered),
        )
        .withColumn(
            "vec_id",
            F.col("vec_id")
            + F.col("__replica").cast("long") * F.lit(VEC_ID_STRIDE),
        )
        .drop("__replica")
    )
    scaled_emb.repartition(int(CPUS)).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )


if __name__ == "__main__":
    main()
