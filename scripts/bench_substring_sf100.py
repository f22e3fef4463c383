"""Root-cause + stabilization evidence for q_substring_dedup at sf100
(r13, VERDICT r12 next #3): the r12 in-sweep phase died inside
WindowExec and the committed wall-clocks spread 46.7-102.7 s.

Three blocks:

1. ``expansion`` (sf1 + sf10): measure the occurrence table's actual
   expansion from the input's Catalyst plan bytes (compressed parquet)
   to window-sort shuffle bytes — the factor
   ``_SPAN_OCC_BYTES_PER_PLAN_BYTE`` that sizes the sort lane's
   spill-aware pre-partitioning (:func:`dedup._spansort_spread`).

2. ``attribution_sf100``: per-stage timing in fresh sessions — the
   map-only occurrence derivation vs the h-window (shuffle + sort +
   count/row_number) vs the full registry query — with the spread OFF
   (r12 shape: 32 concurrent ~GB task sorts) and ON, so the artifact
   names WHICH stage was unstable and what the fix changes.

3. ``protocol_runs``: >= 3 runs of the EXACT in-sweep phase protocol
   (``bench_sf100.py --one q:q_substring_dedup:sf100``, fresh
   interpreter each) with the fix in place, recording pass/fail and
   wall-clock — the done-criterion is two consecutive completions
   without the coordinator retry.

Usage: python scripts/bench_substring_sf100.py [out_json]  # run SOLO
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SFS = {"sf1": "/root/repo/.scratch/sf1",
       "sf10": "/root/repo/.scratch/sf10"}
SF100 = "/root/repo/.scratch/sf100"
# serialized sort-row estimate: 32-char md5 hex UTF8String + long id +
# int pos + tungsten row overhead
OCC_ROW_BYTES = 56


def _session(tag: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"bench-substring-{tag}")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def block_expansion() -> dict:
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup
    from pydiverse_transform_spark.extras.util import plan_size_bytes

    spark = _session("expansion")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf in SFS.items():
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        plan_b = plan_size_bytes(docs)
        occ = dedup.span_occurrences(docs, "text", "doc_id", window=8)
        n = occ.count()
        row = {
            "plan_bytes": plan_b,
            "occ_rows": n,
            "occ_sort_bytes_est": n * OCC_ROW_BYTES,
            "expansion_factor": round(n * OCC_ROW_BYTES / plan_b, 2),
        }
        out[tag] = row
        print(f"  expansion {tag}: {json.dumps(row)}", flush=True)
    # what the shipped sizing does at sf100
    docs100 = spark.read.parquet(f"{SF100}/documents.parquet")
    pb = plan_size_bytes(docs100)
    from pydiverse_transform_spark.extras.dedup import (
        _SPAN_OCC_BYTES_PER_PLAN_BYTE,
        _SPAN_SORT_TASK_BYTES,
    )
    out["sf100_sizing"] = {
        "plan_bytes": pb,
        "factor_shipped": _SPAN_OCC_BYTES_PER_PLAN_BYTE,
        "task_bytes": _SPAN_SORT_TASK_BYTES,
        "n_parts_chosen": int(min(
            (pb * _SPAN_OCC_BYTES_PER_PLAN_BYTE)
            // _SPAN_SORT_TASK_BYTES, 4096)),
    }
    print(f"  sf100_sizing: {json.dumps(out['sf100_sizing'])}",
          flush=True)
    spark.stop()
    return out


def _stage_times(spread_on: bool) -> dict:
    """occ-only vs h-window vs interval-merge timings at sf100 in ONE
    fresh session (page cache assumed warm from a prior block)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup

    spark = _session(f"attr-{spread_on}")
    spark.sparkContext.setLogLevel("ERROR")
    if not spread_on:
        # disable by making want <= cur always
        dedup._SPAN_OCC_BYTES_PER_PLAN_BYTE = 0
    docs = spark.read.parquet(f"{SF100}/documents.parquet")

    t0 = time.time()
    occ = dedup.span_occurrences(docs, "text", "doc_id", window=8)
    occ.agg(F.count(F.lit(1)), F.max(F.length("h"))).collect()
    t_occ = time.time() - t0

    t0 = time.time()
    occ2 = dedup._spansort_spread(docs, occ)
    wh = W.partitionBy("h")
    wr = W.partitionBy("h").orderBy("doc_id", "pos")
    bad = (occ2.withColumn("__cnt", F.count("*").over(wh))
           .withColumn("__rn", F.row_number().over(wr))
           .filter((F.col("__cnt") >= 2) & (F.col("__rn") > 1)))
    n_bad = bad.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("pos").alias("s")).collect()[0]["n"]
    t_window = time.time() - t0

    t0 = time.time()
    full = dedup.substring_dedup(docs, "text", "doc_id", window=8,
                                 dup_strategy="sort")
    full.agg(F.count(F.lit(1)),
             F.sum("n_tokens_after").cast("long")).collect()
    t_full = time.time() - t0
    spark.stop()
    return {"spread_on": spread_on,
            "occ_map_only_sec": round(t_occ, 3),
            "occ_plus_window_sec": round(t_window, 3),
            "window_stage_sec": round(t_window - t_occ, 3),
            "n_bad_rows": int(n_bad),
            "full_pipeline_sec": round(t_full, 3)}


def block_attribution() -> dict:
    out = {}
    for spread_on in (False, True):
        # own interpreter per arm so the 48g heap doesn't accumulate
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage",
             "on" if spread_on else "off"],
            capture_output=True, text=True)
        if r.returncode != 0:
            out["on" if spread_on else "off"] = {
                "error": (r.stderr or "")[-600:]}
        else:
            last = r.stdout.strip().splitlines()[-1]
            out["on" if spread_on else "off"] = json.loads(last)
        print(f"  attribution {'on' if spread_on else 'off'}: "
              f"{json.dumps(out['on' if spread_on else 'off'])}",
              flush=True)
    return out


def block_protocol(n_runs: int = 3) -> list:
    runs = []
    for i in range(n_runs):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "bench_sf100.py"),
             "--one", "q:q_substring_dedup:sf100"],
            capture_output=True, text=True)
        wall = round(time.time() - t0, 3)
        row = {"ok": p.returncode == 0, "wall_sec": wall}
        if p.returncode == 0:
            try:
                row.update(json.loads(
                    p.stdout.strip().splitlines()[-1]))
            except Exception:
                pass
        else:
            row["error"] = (p.stderr or "")[-400:]
        runs.append(row)
        print(f"  protocol run {i + 1}: {json.dumps(row)}", flush=True)
    return runs


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        print(json.dumps(_stage_times(sys.argv[2] == "on")))
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from bench import _load_sentinel

    results = {"sentinel_start": _load_sentinel()}
    results["expansion"] = block_expansion()
    results["attribution_sf100"] = block_attribution()
    results["protocol_runs"] = block_protocol()
    results["sentinel_end"] = _load_sentinel()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
