"""Streaming late-data/backpressure evidence at 10M events (r8 verdict
stretch #8): replay a 10M-event corpus as time-ordered micro-batches
with 10% of the rows in the later batches time-shifted 4 hours into the
past — far beyond the 2-hour watermark — and assert, with committed
numbers, that

  - state stays on its plateau (the late rows add NO state: they are
    dropped before the stateful operator, so the ceiling is identical
    to the clean replay),
  - Spark's ``numRowsDroppedByWatermark`` accounts for (almost exactly)
    the injected late rows — the documented late-arrival contract: an
    event behind the PREVIOUS batch's watermark never reaches the
    operator (the filter lags eviction by one micro-batch, so the first
    late batch can leak a handful into closed-window eviction instead),
  - the windowed aggregate over the stream equals the BATCH aggregate
    over the on-time rows only (late rows contribute nothing).

Usage: python scripts/bench_stream_late.py [events_dir] [out.json]
Defaults: /root/repo/.scratch/ev10m .  Run SOLO.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_FILES = 10
LATE_FRACTION = 0.10
# the events table spans ~30 days -> each replay chunk spans ~3 days;
# a "late" row must land BEHIND the watermark already advanced by the
# previous chunks, so the shift has to clear several chunk spans plus
# the watermark horizon (a 4 h shift inside a 72 h chunk is merely
# out-of-order, not late — measured: 0 drops)
LATE_SHIFT_HOURS = 240
WATERMARK = "2 hours"
FIRST_LATE_FILE = 3  # batches 0-2 replay clean (warm the watermark)


def main():
    src_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.scratch/ev10m"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pydiverse_transform_spark import streaming as st

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-stream-late")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stage = tempfile.mkdtemp(prefix="stream_late_")
    src = os.path.join(stage, "src")
    ref = os.path.join(stage, "ontime_ref")
    os.makedirs(src, exist_ok=True)
    os.makedirs(ref, exist_ok=True)

    # stage time-ordered chunks; in chunks >= FIRST_LATE_FILE shift a
    # deterministic 10% of rows LATE_SHIFT_HOURS into the past
    # (event_id % 10 == 7), putting them far behind the watermark set
    # by the earlier chunks — real pipelines see exactly this shape
    # (stragglers from a delayed upstream partition arriving amid
    # current traffic).  The unshifted complement is staged to a
    # side-by-side batch-reference dir for the equality check.
    batch = spark.read.parquet(f"{src_dir}/events.parquet")
    schema = batch.schema
    pdf = batch.orderBy("ts").toPandas()
    n_rows = len(pdf)
    chunk = (n_rows + N_FILES - 1) // N_FILES
    now = time.time()
    n_late = 0
    import pandas as pd

    for i in range(N_FILES):
        part = pdf.iloc[i * chunk:(i + 1) * chunk].copy()
        ontime = part
        if i >= FIRST_LATE_FILE:
            late_mask = (part["event_id"] % 10) == 7
            ontime = part[~late_mask]
            part.loc[late_mask, "ts"] = (
                part.loc[late_mask, "ts"]
                - pd.Timedelta(hours=LATE_SHIFT_HOURS))
            n_late += int(late_mask.sum())
        path = os.path.join(src, f"chunk{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(part), path,
                       coerce_timestamps="us", version="2.6",
                       allow_truncated_timestamps=True)
        os.utime(path, (now + i, now + i))
        pq.write_table(pa.Table.from_pandas(ontime),
                       os.path.join(ref, f"chunk{i:03d}.parquet"),
                       coerce_timestamps="us", version="2.6",
                       allow_truncated_timestamps=True)

    def drain(stream_df, name, mode="append"):
        t0 = time.time()
        q = (stream_df.writeStream.format("noop")
             .option("checkpointLocation", os.path.join(stage, f"ck_{name}"))
             .outputMode(mode).trigger(availableNow=True).start())
        q.awaitTermination(1200)
        wall = time.time() - t0
        prog = [p for p in q.recentProgress
                if p.get("stateOperators") and p["numInputRows"] > 0]
        totals = [p["stateOperators"][0]["numRowsTotal"] for p in prog]
        dropped = sum(p["stateOperators"][0]
                      .get("numRowsDroppedByWatermark", 0) for p in prog)
        if prog and "numRowsDroppedByWatermark" not in \
                prog[0]["stateOperators"][0]:
            print("WARN stateOperators keys:",
                  sorted(prog[0]["stateOperators"][0].keys()))
        return {
            "wall_sec": round(wall, 2),
            "rows_per_sec": int(n_rows / wall),
            "n_batches": len(prog),
            "state_rows_per_batch": totals,
            "peak_state_rows": max(totals) if totals else 0,
            "rows_dropped_by_watermark": int(dropped),
            "plateau": bool(totals and
                            max(totals[-3:]) <= 1.1 * max(totals[:3])),
        }

    results = {
        "events_dir": src_dir, "n_events": n_rows,
        "n_late_injected": n_late,
        "late_fraction": round(n_late / n_rows, 4),
        "watermark": WATERMARK,
        "late_shift_hours": LATE_SHIFT_HOURS,
    }

    # windowed count aggregate: drop accounting + plateau under late data
    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    agg = st.tumbling_window_agg(stream, window="1 hour",
                                 watermark=WATERMARK)
    results["tumbling_agg"] = drain(agg, "agg")

    # correctness: the streamed aggregate must equal the batch aggregate
    # over on-time rows only (late rows contribute nothing).  Stream to
    # a real sink for the comparison.
    sink = os.path.join(stage, "agg_out")
    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    agg = st.tumbling_window_agg(stream, window="1 hour",
                                 watermark=WATERMARK)
    q = (agg.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", os.path.join(stage, "ck_sink"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(1200)
    streamed = spark.read.parquet(sink)
    ontime = spark.read.parquet(ref)
    # NOTE: append mode only emits CLOSED windows (watermark passed);
    # the final windows of the replay never close, so compare on the
    # window range the stream emitted
    batch_agg = (
        ontime.groupBy(F.window("ts", "1 hour").alias("window"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"), "n_events")
    )
    s = {(r["window_start"], r["window_end"]): r["n_events"]
         for r in streamed.collect()}
    b = {(r["window_start"], r["window_end"]): r["n_events"]
         for r in batch_agg.collect()}
    emitted_match = all(b.get(k) == v for k, v in s.items())
    results["agg_vs_batch_on_time"] = {
        "windows_emitted": len(s),
        "all_emitted_windows_match_batch": bool(emitted_match),
    }

    # dedup over a fingerprint: plateau + drop accounting on the
    # bounded-state operator
    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    fp = F.md5(F.concat_ws(
        "\x1f", *[F.col(f.name).cast("string") for f in schema.fields]))
    results["dedup_stream"] = drain(
        st.dedup_stream(stream, fp, watermark=WATERMARK), "dedup")

    print(json.dumps(results))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
