"""Streaming state/throughput evidence at sf1 (1M events, 10 micro-batches).

Runs the two custom stateful paths over the scale corpus as a file
stream replayed in event-time order (maxFilesPerTrigger=1 → one
micro-batch per staged file):

  - stateful_sessionize (applyInPandasWithState, 1 state row per user)
  - dedup_stream (dropDuplicatesWithinWatermark, state bounded by the
    watermark horizon)

and reports per-path: wall-clock, rows/s, per-batch numRowsTotal, the
peak, and a plateau verdict (late batches hold no more state than early
ones → the state ceiling is independent of how many batches stream in).

Usage: python scripts/bench_stream_scale.py [sf_dir] [n_files]
Prints one JSON line.  Run SOLO.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pydiverse_transform_spark import streaming as st
    from test_streaming import _time_ordered_files

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-stream-scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stage = tempfile.mkdtemp(prefix="stream_scale_")
    src = os.path.join(stage, "src")
    schema = _time_ordered_files(spark, sf, src, n_files=n_files)
    n_rows = spark.read.parquet(src).count()

    def drain(stream_df, name, mode="append"):
        t0 = time.time()
        q = (stream_df.writeStream.format("noop")
             .option("checkpointLocation", os.path.join(stage, f"ck_{name}"))
             .outputMode(mode).trigger(availableNow=True).start())
        q.awaitTermination(600)
        wall = time.time() - t0
        prog = [p for p in q.recentProgress
                if p.get("stateOperators") and p["numInputRows"] > 0]
        totals = [p["stateOperators"][0]["numRowsTotal"] for p in prog]
        return {
            "wall_sec": round(wall, 2),
            "rows_per_sec": int(n_rows / wall),
            "n_batches": len(prog),
            "state_rows_per_batch": totals,
            "peak_state_rows": max(totals) if totals else 0,
            # ceiling independent of batch count: the last batches hold
            # no more state than the batches right after warm-up
            "plateau": bool(totals and
                            max(totals[-3:]) <= 1.1 * max(totals[:3])),
        }

    results = {"sf_dir": sf, "n_events": n_rows, "n_batches": n_files}

    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    results["stateful_sessionize"] = drain(
        st.stateful_sessionize(stream), "sess")

    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    fp = F.md5(F.concat_ws(
        "\x1f", *[F.col(f.name).cast("string") for f in schema.fields]))
    results["dedup_stream"] = drain(
        st.dedup_stream(stream, fp, watermark="2 hours"), "dedup")

    print(json.dumps(results))
    shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
