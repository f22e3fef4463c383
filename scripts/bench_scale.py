"""Scaling-curve benchmark for the data-bound pipelines: time
q_dedup_minhash, q_neardup_corpus and q_sessionize_scalable at sf0.1 and
at the 10x corpus from scripts/gen_scale_corpus.py, and report the
per-query slope (time ratio per 10x data).

A slope near 1 means the extra decade of data rides on the fixed
scheduler/codegen floor; well under 10 means sub-linear wall-clock in
data size at this core count — the property that has to hold for the
1000-executor / 100 TB story.  A slope >= ~10 would mean the pipeline
is already data-bound super-linearly at 32 cores — a red flag.

Usage: python scripts/bench_scale.py [sf01_dir] [sf1_dir]
Prints one JSON line.  Run SOLO — concurrent Spark sessions inflate
timings 3-6x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
QUERIES = ["q_dedup_minhash", "q_neardup_corpus", "q_sessionize_scalable",
           "q_remove_repeated_segments", "q_substring_dedup"]


def _pretrain_pipeline(docs):
    """The composed quality-gate -> exact-dedup -> token-budget ->
    deterministic-shuffle chain of q_pretrain_pipeline (three key
    shuffles total, one tokenization)."""
    from pydiverse_transform_spark.extras import dedup as dd
    from pydiverse_transform_spark.extras import sampling as sp
    from pydiverse_transform_spark.extras import text as tx

    gated = tx.gopher_filter(docs, "text", min_words=10,
                             min_required_words=1)
    ded = dd.exact_dedup_rows(gated, "text", "doc_id")
    mix = sp.take_token_budget(
        ded.select("doc_id", "lang", "n_chars"),
        "n_chars", 1_000_000, order_by="doc_id", partition_by=["lang"],
    )
    return sp.deterministic_shuffle(mix, "doc_id", salt="pre", n_shards=64)


def _scored_pipeline(docs):
    """The model-gated chain of q_pretrain_pipeline_scored: gate ->
    exact dedup -> bigram-LM train + score -> per-lang percentile cut
    -> token budget -> deterministic shuffle (the full curation path;
    deduped corpus persisted once for its four consumers)."""
    from pydiverse_transform_spark.extras import classify as cl
    from pydiverse_transform_spark.extras import dedup as dd
    from pydiverse_transform_spark.extras import sampling as sp
    from pydiverse_transform_spark.extras import text as tx

    gated = tx.gopher_filter(docs, "text", min_words=10,
                             min_required_words=1)
    ded = dd.exact_dedup_rows(gated, "text", "doc_id").persist()
    grams, ctx = cl.bigram_lm_train(ded)
    scored = cl.lm_score(ded, grams, ctx)
    enriched = ded.select("doc_id", "lang", "n_chars").join(scored,
                                                            "doc_id")
    keep = sp.filter_by_quantile(enriched, "lm_logprob", 0.2,
                                 partition_by=["lang"])
    mix = sp.take_token_budget(
        keep.select("doc_id", "lang", "n_chars"),
        "n_chars", 1_000_000, order_by="doc_id", partition_by=["lang"],
    )
    return sp.deterministic_shuffle(mix, "doc_id", salt="pre2",
                                    n_shards=64)


def _dsir_select(docs):
    """DSIR train (single-pass labeled-subset form) + map-only scoring
    + Gumbel top-1000 selection."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import importance as imp

    return imp.gumbel_topk(
        imp.dsir_weights(docs, F.col("lang") == "en"),
        "dsir_weight", 1000, "doc_id", salt="bench")


def _nb_train_score(docs):
    """Train the NB classifier on lang labels and score the corpus —
    both phases per run (the model shuffle is vocabulary-bounded, so
    per-doc cost must fall with corpus size)."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import classify as cl

    w = cl.nb_train(docs, F.col("lang") == "en")
    return cl.nb_score(docs, w)


def _lm_train_score(docs):
    """Train the bigram LM on the corpus and score every document."""
    from pydiverse_transform_spark.extras import classify as cl

    grams, ctx = cl.bigram_lm_train(docs)
    return cl.lm_score(docs, grams, ctx)


def main():
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    if not os.path.isdir(sf1):
        # .scratch is gitignored — regenerate the deterministic corpus
        # (same seedless hash-derived content every time)
        import subprocess

        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "gen_scale_corpus.py"),
             "10", sf01, sf1],
            check=True,
        )

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def run(name, sf_dir):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    # warm once
    qs[QUERIES[0]](spark, sf01).write.format("noop") \
        .mode("overwrite").save()

    result = {}
    for name in QUERIES:
        t_small = run(name, sf01)
        t_big = run(name, sf1)
        result[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "slope_per_10x": round(t_big / t_small, 2),
        }

    # The driver queries run the AUTO strategy, which switches from
    # persist-everything (small corpus) to the no-materialization path
    # between sf0.1 and sf1 — so their slope mixes two strategies.  The
    # number that extrapolates to 100 TB is the SCALABLE path measured
    # at both scales:
    from pyspark.sql import functions as F  # noqa: F401

    from pydiverse_transform_spark.extras import dedup as dd
    from pydiverse_transform_spark.extras import text as tx

    def run_fn(fn, sf_dir):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    # µs/doc is the metric that survives both the scheduler floor (which
    # inflates small-corpus slopes) and core saturation (where per-decade
    # wall-clock slope tends to 10 by arithmetic): linear scaling ==
    # flat-or-falling per-row cost across decades.
    scalable = {}
    extra_sfs = [p for p in sys.argv[3:] if os.path.isdir(p)]
    for name, fn in [
        ("minhash_dedup_pairs",
         lambda d: dd.minhash_dedup_pairs(d, persist_shingles=False)),
        ("neardup_dedup", dd.neardup_dedup),
        ("remove_repeated_segments",
         lambda d: tx.remove_repeated_segments(d, persist_segments=False)),
        ("build_vocab",
         lambda d: tx.build_vocab(d, min_count=2, top_n=50000)),
        ("tfidf_top_terms",
         lambda d: tx.tfidf_top_terms(d, k=5)),
        ("gopher_filter",
         lambda d: tx.gopher_filter(d, min_words=10,
                                    min_required_words=1)),
        ("pretrain_pipeline", _pretrain_pipeline),
        ("scored_pipeline", _scored_pipeline),
        ("dsir_select", _dsir_select),
        ("nb_train_score", _nb_train_score),
        ("lm_train_score", _lm_train_score),
    ]:
        entry = {}
        for sf_dir in [sf01, sf1, *extra_sfs]:
            n = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")).count()
            t = run_fn(fn, sf_dir)
            entry[os.path.basename(sf_dir.rstrip("/"))] = {
                "sec": t, "n_docs": n,
                "us_per_doc": round(t / n * 1e6, 1),
            }
        scalable[name] = entry

    line = json.dumps({
        "metric": "scaling_slope_10x",
        "queries": result,
        "scalable_path": scalable,
        "cpus": int(CPUS),
    })
    spark.stop()
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
