"""Bloom-prefilter decontamination scale evidence (r11): at
sf1/sf10/sf100 documents (50k / 500k / 5M docs), run decontaminate
with a LARGE probe set (every doc_id % 50 == 0 — 2% of the corpus, so
the probe's distinct-shingle set reaches ~10M strings at sf100 (a
multi-GB JVM hash relation vs a 12 MB bitmap), the regime
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
        # the shingle-scale block's broadcast lane collects a ~10M-row
        # probe relation through the driver; the default 1g result cap
        # would fail the lane before it could lose honestly
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {"sentinel_start": _load_sentinel(), "probe": "doc_id % 50 = 0"}
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            print(f"  {tag}: corpus missing, skipped", flush=True)
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        probe = docs.filter(F.col("doc_id") % 50 == 0)
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
                    F.coalesce(F.sum("doc_id"), F.lit(0))
                    .cast("long").alias("s")).collect()[0]
                times.append(time.time() - t0)
            checks[method] = (int(agg["n"]), int(agg["s"]))
            row[f"decontaminate_{method}_sec"] = round(min(times), 3)
        row["results_equal"] = checks["broadcast"] == checks["bloom"]
        row["n_clean"] = checks["broadcast"][0]
        assert row["results_equal"], f"{tag}: {checks}"
        results[tag] = row
        print(f"  {tag}: {json.dumps(row)}", flush=True)

    # --- id-scale block: the regime the bloom lane exists for --------
    # The documents corpus's 3-word shingle space SATURATES (~30k
    # distinct shingles at any sf — synthetic small-vocabulary text),
    # so a doc-sampled probe can never produce the 10^7-key member set
    # the bitmap trade targets.  Real tables provide one: member =
    # every event id of 10% of users at sf100 (~10M bigint keys),
    # probe = ALL 100M events.  Three lanes, identical results
    # required: explicit broadcast semi-join (the hash relation the
    # bitmap replaces), plain shuffled semi-join (what the planner
    # does when the member side is too big to broadcast), and bloom
    # prefilter (map-only over the 100M side) + exact verify semi-join
    # over the ~fpp survivors.
    sf100 = SFS.get("sf100")
    if sf100 and os.path.isdir(sf100):
        from pyspark.sql.functions import broadcast

        from pydiverse_transform_spark.extras.bloom import (
            bloom_filter_hits,
        )

        ev = spark.read.parquet(f"{sf100}/events.parquet")
        member = (ev.filter(F.col("user_id") % 10 == 0)
                  .select("event_id").distinct())
        n_member = member.count()
        row = {"n_events": ev.count(), "n_member_ids": n_member}
        bf = bloom_build(member, "event_id", n_items=n_member,
                         fpp=0.01)
        row["bloom_bitmap_bytes"] = bf.n_bytes
        row["member_payload_bytes_min"] = n_member * 8  # raw longs

        def mn2(make):
            times = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                agg = make().agg(
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum("event_id"), F.lit(0))
                    .cast("long").alias("s")).collect()[0]
                times.append(time.time() - t0)
            return round(min(times), 3), (int(agg["n"]), int(agg["s"]))

        checks = {}
        row["semi_broadcast_sec"], checks["b"] = mn2(
            lambda: ev.join(broadcast(member), "event_id",
                            "left_semi"))
        row["semi_shuffle_sec"], checks["s"] = mn2(
            lambda: ev.join(member.hint("shuffle_hash"), "event_id",
                            "left_semi"))
        row["bloom_prefilter_verify_sec"], checks["f"] = mn2(
            lambda: bloom_filter_hits(ev, bf, "event_id")
            .join(member.hint("shuffle_hash"), "event_id",
                  "left_semi"))
        row["results_equal"] = len(set(checks.values())) == 1
        assert row["results_equal"], checks
        row["n_hits"] = checks["b"][0]
        results["id_scale_sf100"] = row
        print(f"  id_scale_sf100: {json.dumps(row)}", flush=True)

    # --- shingle-scale block (r12): the DESIGN regime ----------------
    # The corpus's own shingle space saturates (~30k distinct), so the
    # 10^7-shingle probe the bloom docstring targets is built
    # synthetically: 100k eval docs of 102 globally-unique words each
    # => ~10M distinct 3-word shingles that do NOT occur in the corpus
    # (the realistic decontamination shape: an eval suite is mostly
    # absent from the pretraining corpus), plus 50 real corpus docs so
    # the verify join has true hits to keep exact.  The broadcast lane
    # must build and ship a 10M-string hash relation (~GB); the bloom
    # lane ships a ~12 MB bitmap and map-side-prunes the exploded
    # corpus shingles before any shuffle.
    if sf100 and os.path.isdir(sf100):
        docs = spark.read.parquet(f"{sf100}/documents.parquet")
        n_probe_docs = 100_000
        syn = spark.range(n_probe_docs).select(
            (F.col("id") + F.lit(1_000_000_000)).alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(0), F.lit(101)),
                lambda i: F.concat(F.lit("ev"),
                                   (F.col("id") * 102 + i)))
            ).alias("text"))
        probe_path = os.path.join(os.path.dirname(sf100),
                                  "bloom_probe_sf100.parquet")
        syn.unionByName(
            docs.orderBy("doc_id").limit(50)
            .select((F.col("doc_id") + F.lit(2_000_000_000))
                    .alias("doc_id"), "text")) \
            .write.mode("overwrite").parquet(probe_path)
        # read the probe BACK from parquet: an eval suite is a file in
        # practice, and Catalyst's sizeInBytes (what method="auto"
        # routes on) is file-size-accurate for scans but cannot size
        # range-generated strings
        probe = spark.read.parquet(probe_path)
        row = {"n_docs": docs.count(), "n_probe_docs": n_probe_docs + 50}

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

        from pydiverse_transform_spark.extras.dedup import (
            _BLOOM_AUTO_PROBE_BYTES,
        )
        from pydiverse_transform_spark.extras.util import plan_size_bytes

        row["probe_plan_size_bytes"] = plan_size_bytes(probe)
        row["auto_route"] = (
            "bloom" if plan_size_bytes(probe) > _BLOOM_AUTO_PROBE_BYTES
            else "broadcast")

        checks = {}
        for method in ("broadcast", "bloom"):
            times = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                out = dedup.decontaminate(docs, probe, method=method)
                agg = out.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum("doc_id"), F.lit(0))
                    .cast("long").alias("s")).collect()[0]
                times.append(time.time() - t0)
            checks[method] = (int(agg["n"]), int(agg["s"]))
            row[f"decontaminate_{method}_sec"] = round(min(times), 3)
        row["results_equal"] = checks["broadcast"] == checks["bloom"]
        row["n_clean"] = checks["broadcast"][0]
        assert row["results_equal"], f"shingle_scale: {checks}"
        results["shingle_scale_sf100"] = row
        print(f"  shingle_scale_sf100: {json.dumps(row)}", flush=True)

    results["sentinel_end"] = _load_sentinel()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
