"""Backfill-shaped ingest-dedup attribution (r14, VERDICT r13 next
#1/#6): measure the EXISTS-semantics lane
(extras/dedup.py _probe_hits_exists, now the neardup_filter_new /
neardup_ingest_stream implementation) against the pre-r14 pair-lane
derivation on the shape that motivated the change — an increment as
large as the index itself (half the replica-saturated scale corpus
probing the other half).

Lanes, per sf (sf10 = 500k docs, sf100 = 5M docs):

- ``build``   — index over doc_id % 2 != 0 (fresh every sf; the shape
  is the point, not index reuse).
- ``exists``  — ``neardup_filter_new(admit=False)`` survivor count:
  bucket join -> map-side estimator+threshold -> map-side partial
  distinct(probe_id).  Shuffle bounded by increment id count.
- ``pair``    — the pre-r14 derivation: ``minhash_index_lookup(
  governors="off")`` -> distinct probe ids -> anti-join.  Shuffles one
  row per passing candidate PAIR (grows with index dup density — the
  230M-pair wall of SCALE_BENCH_r12/r13).  Runs under a hard timeout;
  a timeout is recorded honestly, not retried.
- ``verify``  — survivor counts equal across lanes (recall identity at
  scale, complementing the exact set-equality pin in
  tests/test_r14_fixes.py at sf0.001).

Every phase runs in its own interpreter/JVM (same isolation rationale
as scripts/bench_sf100.py).  Run SOLO on a quiet host.

Usage:    python scripts/bench_ingest_exists.py [out_json]
Internal: python scripts/bench_ingest_exists.py --phase <lane>:<tag>[:<threshold>]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# 0.7 = the neardup_filter_new default (strict near-dup: >= 12/16
# signature positions agree — few pairs pass, both lanes bounded);
# 0.2 = the aggressive setting the r12/r13 scale sweeps used, where a
# replica-saturated corpus passes pair volume that grows with dup
# density and the pair lane's per-pair exchange becomes the wall
THRESHOLDS = [0.7, 0.2]

SFS = {
    "sf1": os.path.join(ROOT, ".scratch", "sf1"),
    "sf10": os.path.join(ROOT, ".scratch", "sf10"),
    "sf100": os.path.join(ROOT, ".scratch", "sf100"),
}
PAIR_TIMEOUT = {"sf1": 600, "sf10": 1200, "sf100": 3600}


def _idx_path(tag: str) -> str:
    return os.path.join(ROOT, ".scratch", f"ingest_exists_idx_{tag}")


def _spark(app):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _sides(spark, tag):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        os.path.join(SFS[tag], "documents.parquet"))
    return (docs.filter(F.col("doc_id") % 2 != 0),
            docs.filter(F.col("doc_id") % 2 == 0))


def phase_build(tag: str):
    import shutil

    from pydiverse_transform_spark.extras import dedup

    spark = _spark(f"ingest-exists-build-{tag}")
    corpus, inc = _sides(spark, tag)
    path = _idx_path(tag)
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    dedup.write_minhash_index(corpus, path)
    out = {"build_sec": round(time.perf_counter() - t0, 3),
           "index_docs": corpus.count(), "increment_docs": inc.count()}
    spark.stop()
    print(json.dumps(out))


def phase_exists(tag: str, threshold: float):
    from pydiverse_transform_spark.extras import dedup

    spark = _spark(f"ingest-exists-exists-{tag}")
    _, inc = _sides(spark, tag)
    best, n = None, None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = dedup.neardup_filter_new(
            spark, _idx_path(tag), inc,
            threshold=threshold, admit=False).count()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    spark.stop()
    print(json.dumps({"exists_sec": round(best, 3), "survivors": n}))


def phase_pair(tag: str, threshold: float):
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup

    spark = _spark(f"ingest-exists-pair-{tag}")
    _, inc = _sides(spark, tag)
    meta = dedup.read_minhash_meta(spark, _idx_path(tag))
    id_col = meta["id_col"]
    t0 = time.perf_counter()
    hits = (dedup.minhash_index_lookup(
        spark, _idx_path(tag), inc, threshold=threshold,
        governors="off")
        .select(F.col("probe_id").alias(id_col)).distinct())
    n = inc.join(hits, on=id_col, how="left_anti").count()
    sec = time.perf_counter() - t0
    spark.stop()
    print(json.dumps({"pair_sec": round(sec, 3), "survivors": n}))


def _run_phase(lane: str, tag: str, timeout: int | None = None,
               threshold: float | None = None):
    spec = f"{lane}:{tag}" if threshold is None \
        else f"{lane}:{tag}:{threshold}"
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", spec],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"exit_ok": False, "timed_out": True,
                "timeout_sec": timeout,
                "wall_sec": round(time.perf_counter() - t0, 1)}
    row = {"exit_ok": p.returncode == 0,
           "wall_sec": round(time.perf_counter() - t0, 1)}
    if p.returncode == 0:
        last = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        row.update(json.loads(last[-1]) if last else {})
    else:
        row["stderr_tail"] = p.stderr[-1500:]
    return row


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 \
        else "INGEST_EXISTS_r14.json"
    result = {"metric": "backfill_ingest_dedup_lanes",
              "thresholds": THRESHOLDS,
              "shape": "increment = half corpus vs index = other half "
                       "(replica-saturated scale corpus)",
              "sfs": {}}
    for tag in SFS:
        if not os.path.isdir(SFS[tag]):
            result["sfs"][tag] = {"skipped": "corpus missing"}
            continue
        row = {"build": _run_phase("build", tag)}
        for th in THRESHOLDS:
            lane_row = {
                "exists": _run_phase("exists", tag, threshold=th),
                "pair": _run_phase("pair", tag,
                                   timeout=PAIR_TIMEOUT[tag],
                                   threshold=th),
            }
            ve = lane_row["exists"].get("survivors")
            vp = lane_row["pair"].get("survivors")
            lane_row["survivors_equal"] = (
                ve == vp if (ve is not None and vp is not None) else None)
            if lane_row["exists"].get("exists_sec") \
                    and lane_row["pair"].get("pair_sec"):
                lane_row["speedup_pair_over_exists"] = round(
                    lane_row["pair"]["pair_sec"]
                    / lane_row["exists"]["exists_sec"], 2)
            row[f"threshold_{th}"] = lane_row
        result["sfs"][tag] = row
        print(json.dumps({tag: row}), flush=True)
    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        parts = sys.argv[2].split(":")
        lane, tag = parts[0], parts[1]
        if lane == "build":
            phase_build(tag)
        else:
            {"exists": phase_exists, "pair": phase_pair}[lane](
                tag, float(parts[2]))
    else:
        main()
