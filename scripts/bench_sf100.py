"""Three-decade scaling curve (r10, VERDICT r9 next #4): time the
slope watch-list at sf0.1 / sf1 / sf10 / sf100 and report per-decade
slopes.  The r9 two-decade sweep flattened every watch query except
q_semdedup_kprop, whose sf1->sf10 slope (9x/decade) was the ORACLE's
k-cap pinning k at 256; r10 replaces the quantizer with sign-LSH
buckets (k = 2^p ~ n/100, oracle-reproducible at any k) after the
staged-argmin family was measured NOT to quantize the replica corpus
(840k of sf100's 2M vectors in one cell), so this sweep is the gate's
evidence that the true k~n/100 operating point holds (r9
done-criterion: sf1->sf10 slope <= 3x/decade, plus a third decade for
the rest of the list).

Per-query corpus coverage is declared explicitly: the sf100 replicas
cover the TPC-H tables + documents + embeddings + (new in r10) events,
so the asof/interval time-join family gets the third decade too.

q_minhash_index_lookup note: the REGISTRY query rebuilds the LSH index
inside the query (the oracle must see a deterministic index), so its
wall-clock is build (one linear corpus map pass) + lookup; at large sf
the linear build dominates and the composite slope tends to 10x/decade
by arithmetic.  r11 (VERDICT r10 next #1): the sweep row now carries
its own per-component attribution — the index is built ONCE per sf
(build_sec), then the registry's exact probe quarter runs against the
PERSISTED index ungoverned (lookup_sec) and governed
(lookup_governed_sec, min_bands=2/top_k=3), each with per-decade
slopes — so the gate artifact itself shows which component grows
instead of deferring to the separate soak
(scripts/bench_minhash_index.py, MINHASH_INDEX_r10.json).

Usage: python scripts/bench_sf100.py [out_json]   # run SOLO
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scratch/sf1",
    "sf10": "/root/repo/.scratch/sf10",
    "sf100": "/root/repo/.scratch/sf100",
}

# query -> SF tags to run (ordered small -> large)
COVERAGE = {
    "q03_shipping_priority": ["sf0.1", "sf1", "sf10", "sf100"],
    "q13_customer_distribution": ["sf0.1", "sf1", "sf10", "sf100"],
    "q_semdedup_kprop": ["sf0.1", "sf1", "sf10", "sf100"],
    "q_substring_dedup": ["sf0.1", "sf1", "sf10", "sf100"],
    "q_minhash_index_lookup": ["sf0.1", "sf1", "sf10", "sf100"],
    "q_cosine_topk": ["sf0.1", "sf1", "sf10", "sf100"],
    "q_temperature_mix": ["sf0.1", "sf1", "sf10", "sf100"],
    # r10: events regenerated at factor 1000 too (~2 GB) — full three
    # decades for the time-join family as well
    "q_asof_join": ["sf0.1", "sf1", "sf10", "sf100"],
    "q_interval_join": ["sf0.1", "sf1", "sf10", "sf100"],
}

_DECADES = [("sf0.1", "sf1", "slope_01_to_1"),
            ("sf1", "sf10", "slope_1_to_10"),
            ("sf10", "sf100", "slope_10_to_100")]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import _load_sentinel

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-sf100")
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
    qs["q03_shipping_priority"](spark, SFS["sf0.1"]).write \
        .format("noop").mode("overwrite").save()

    result = {}
    for name, tags in COVERAGE.items():
        row = {}
        for tag in tags:
            sf_dir = SFS[tag]
            if not os.path.isdir(sf_dir):
                row[tag] = None
                continue
            row[tag] = run(name, sf_dir)
        for lo, hi, key in _DECADES:
            if row.get(lo) and row.get(hi):
                row[key] = round(row[hi] / row[lo], 2)
        result[name] = row
        print(f"  {name}: {row}", file=sys.stderr)

    # --- q_minhash_index_lookup per-component attribution (r11) -----
    # The composite number above rebuilds the index every run by
    # construction (the oracle must replay it); decompose it with the
    # registry's EXACT corpus/probe split so the gate artifact shows
    # which component grows: build once per sf, then time the
    # persisted-index lookup (ungoverned and governed, min-of-2, noop
    # sink like every other row).
    if "q_minhash_index_lookup" in result:
        import shutil

        from pyspark.sql import functions as F

        from pydiverse_transform_spark.extras import dedup

        comp = {"split": "corpus doc_id % 4 != 0, probe % 4 == 0 "
                         "(identical to the registry query); "
                         "threshold 0.2; governed = min_bands=2, "
                         "top_k=3 (identical to "
                         "q_minhash_lookup_governed)"}

        def lk(path, probe, **kw):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                dedup.minhash_index_lookup(spark, path, probe,
                                           threshold=0.2, **kw) \
                    .write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            return round(best, 3)

        for tag in COVERAGE["q_minhash_index_lookup"]:
            sf_dir = SFS[tag]
            if not os.path.isdir(sf_dir):
                continue
            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet"))
            corpus = docs.filter(F.col("doc_id") % 4 != 0)
            probe = docs.filter(F.col("doc_id") % 4 == 0)
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".scratch",
                f"mhidx_scale_{tag}")
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.perf_counter()
            dedup.write_minhash_index(corpus, path)
            row = {"build_sec": round(time.perf_counter() - t0, 3),
                   "lookup_sec": lk(path, probe),
                   "lookup_governed_sec": lk(path, probe, min_bands=2,
                                             top_k=3)}
            comp[tag] = row
            shutil.rmtree(path, ignore_errors=True)
            print(f"  q_minhash_index_lookup[{tag}]: {row}",
                  file=sys.stderr)
        for metric in ("build_sec", "lookup_sec", "lookup_governed_sec"):
            for lo, hi, key in _DECADES:
                if comp.get(lo, {}).get(metric) \
                        and comp.get(hi, {}).get(metric):
                    comp.setdefault("slopes", {}).setdefault(
                        metric, {})[key] = round(
                        comp[hi][metric] / comp[lo][metric], 2)
        result["q_minhash_index_lookup"]["components"] = comp

    # --- sorted event-log layout (r11, VERDICT r10 next #6) ---------
    # Stage the bucketed-sorted events table once per sf (stage_sec),
    # then time the sort-free operators against it vs their
    # layout-agnostic twins on the plain parquet — the claim is that
    # paying the sort once at ingest beats paying a shuffle+sort per
    # query, and that the gap widens with data size (q_asof_join's
    # unsorted row above is the asof comparison point).
    from pyspark.sql import functions as F  # noqa: F811

    from pydiverse_transform_spark.extras import events as ev
    from pydiverse_transform_spark.extras.asof import asof_join_colocated

    def mn2(fn):
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    def _sess_agg(s):
        return (s.select("user_id", "session_id",
                         ev.epoch_us(F.col("ts")).alias("__us"))
                .groupBy("user_id", "session_id")
                .agg(F.min("__us").alias("session_start_us"),
                     F.max("__us").alias("session_end_us"),
                     F.count(F.lit(1)).alias("n_events")))

    evlayout = {"note": "stage_sec = one-time bucketed-sorted write "
                        "(32 buckets, sorted user_id/ts/prio); *_presorted "
                        "run over the staged table (plan: no Exchange, no "
                        "Sort — tests/test_event_log_layout.py); "
                        "asof_unsorted comparison point is the "
                        "q_asof_join row above; sessionize_unsorted_sec "
                        "is the plain window on raw parquet"}
    for tag in ["sf0.1", "sf1", "sf10", "sf100"]:
        sf_dir = SFS[tag]
        if not os.path.isdir(sf_dir):
            continue
        t0 = time.perf_counter()
        name = entry_mod._event_log_staged(spark, sf_dir)
        row = {"stage_sec": round(time.perf_counter() - t0, 3)}
        t = ev.read_event_log(spark, name)
        row["asof_presorted_sec"] = mn2(
            lambda: asof_join_colocated(
                t, on="ts", by=["user_id"], side_col="event_prio",
                payload=["value"])
            .select("event_id", "user_id", "ts", "ts_right",
                    F.round(F.col("value_right"), 6)
                    .alias("purchase_value")))
        row["sessionize_presorted_sec"] = mn2(
            lambda: _sess_agg(ev.sessionize(t, "user_id", "ts", 30)))
        row["sessionize_unsorted_sec"] = mn2(
            lambda: _sess_agg(ev.sessionize(
                ev.load_events(spark, sf_dir), "user_id", "ts", 30)))
        if result.get("q_asof_join", {}).get(tag):
            row["asof_unsorted_sec"] = result["q_asof_join"][tag]
        evlayout[tag] = row
        print(f"  event_log_layout[{tag}]: {row}", file=sys.stderr)
    result["event_log_layout"] = evlayout

    sent_end = _load_sentinel()
    payload = {
        "metric": "three_decade_scaling",
        "note": ("min-of-2 per (query, sf), noop sink, cache cleared "
                 "between runs; sf1/sf10/sf100 corpora are "
                 "gen_scale_corpus replicas (self-contained per-replica "
                 "TPC-H keys, word-permuted documents, fresh-id "
                 "embeddings).  q_semdedup_kprop runs the TRUE k~n/100 "
                 "operating point at every sf (r10: sign-LSH quantizer, "
                 "k = 2^clamp(ceil(log2(n/100)),4,15) = 32 / 256 / 2048 "
                 "/ 32768 cells per decade; its workload is itself "
                 "superlinear — replica cliques grow pair volume 100x "
                 "per decade — so judge its slope per PAIR).  "
                 "q_minhash_index_lookup is a build+lookup composite "
                 "by construction; its 'components' block attributes "
                 "it per sf (index built once, persisted-index lookup "
                 "timed ungoverned + governed, per-component slopes)."),
        "cpus": int(CPUS),
        "sentinel": {"start": sent_start, "end": sent_end},
        "queries": result,
    }
    spark.stop()
    line = json.dumps(payload)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
