"""Z-order layout scale evidence (r11): at sf1/sf10/sf100 events
(1M / 10M / 100M rows), stage the same table three ways — random
(repartition), single-sorted on user_id (write_sorted's layout), and
z-ordered on (user_id, ts) — with MATCHED file counts, then measure
for the middle-10%-per-dimension 2-D box predicate:

- footer-stats pruning (row groups / rows a stats-pruning reader must
  read, from pyarrow metadata — the same min/max stats Spark's parquet
  reader prunes row groups with), for the 2-D box AND each single
  dimension — the single-sorted layout wins on its own key and loses
  on the other, the z layout prunes on both;
- Spark wall-clock for the box aggregate over each layout (min of 2,
  noop-materialized).

The one-time layout cost (the z write's range shuffle) is also
reported per sf, so the artifact shows where the layout pays for
itself: break-even after cost_z / (t_random - t_z) re-reads.

Usage: python scripts/bench_zorder.py [out_json]   # run SOLO
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

SFS = {
    "sf1": "/root/repo/.scratch/sf1",
    "sf10": "/root/repo/.scratch/sf10",
    "sf100": "/root/repo/.scratch/sf100",
}
STAGE = "/root/repo/.scratch/zorder_bench"
# files sized so row groups stay well under the 128 MB default block:
# pruning granularity is the row group, more files = finer pruning for
# ALL layouts equally (matched counts keep the comparison fair)
N_FILES = {"sf1": 32, "sf10": 64, "sf100": 256}


def _box(ev, F):
    r = ev.agg(
        F.min("user_id").alias("umn"), F.max("user_id").alias("umx"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("tmn"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("tmx"),
    ).collect()[0]
    lo_u = r.umn + (r.umx - r.umn) * 45 // 100
    hi_u = r.umn + (r.umx - r.umn) * 55 // 100
    epoch = datetime.datetime(1970, 1, 1)
    lo_t = epoch + datetime.timedelta(
        microseconds=r.tmn + (r.tmx - r.tmn) * 45 // 100)
    hi_t = epoch + datetime.timedelta(
        microseconds=r.tmn + (r.tmx - r.tmn) * 55 // 100)
    return lo_u, hi_u, lo_t, hi_t


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import _load_sentinel
    from pydiverse_transform_spark.sources.sinks import (
        rowgroup_pruning_stats,
        zorder_key,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-zorder")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {"sentinel_start": _load_sentinel(), "n_files": N_FILES}
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            print(f"  {tag}: corpus missing, skipped", flush=True)
            continue
        n_files = N_FILES[tag]
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        lo_u, hi_u, lo_t, hi_t = _box(ev, F)
        pred2d = {"user_id": (lo_u, hi_u), "ts": (lo_t, hi_t)}
        row = {"n_rows": ev.count()}

        paths = {}
        shutil.rmtree(STAGE, ignore_errors=True)
        for layout in ("random", "sorted1d", "zorder"):
            p = os.path.join(STAGE, f"{tag}_{layout}")
            t0 = time.time()
            if layout == "random":
                ev.repartition(n_files).write.mode("overwrite").parquet(p)
            elif layout == "sorted1d":
                (ev.repartitionByRange(n_files, "user_id")
                 .sortWithinPartitions("user_id")
                 .write.mode("overwrite").parquet(p))
            else:
                zdf, _ = zorder_key(ev, ["user_id", "ts"], bits=8)
                (zdf.repartitionByRange(n_files, "__z")
                 .sortWithinPartitions("__z").drop("__z")
                 .write.mode("overwrite").parquet(p))
            row[f"stage_{layout}_sec"] = round(time.time() - t0, 3)
            paths[layout] = p

        for layout, p in paths.items():
            row[f"prune_{layout}_2d"] = rowgroup_pruning_stats(p, pred2d)
            row[f"prune_{layout}_user"] = rowgroup_pruning_stats(
                p, {"user_id": (lo_u, hi_u)})
            row[f"prune_{layout}_ts"] = rowgroup_pruning_stats(
                p, {"ts": (lo_t, hi_t)})
            times = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                (spark.read.parquet(p)
                 .where(F.col("user_id").between(lo_u, hi_u)
                        & F.col("ts").between(F.lit(lo_t), F.lit(hi_t)))
                 .groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("value").alias("v"))
                 .write.format("noop").mode("overwrite").save())
                times.append(time.time() - t0)
            row[f"scan_{layout}_sec"] = round(min(times), 3)

        # break-even re-read count for the z layout vs random staging
        dz = row["scan_random_sec"] - row["scan_zorder_sec"]
        extra = row["stage_zorder_sec"] - row["stage_random_sec"]
        row["breakeven_rereads"] = (
            round(extra / dz, 1) if dz > 0 else None)
        results[tag] = row
        print(f"  {tag}: {json.dumps(row, default=str)}", flush=True)
        shutil.rmtree(STAGE, ignore_errors=True)

    results["sentinel_end"] = _load_sentinel()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
    print(json.dumps(results, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
