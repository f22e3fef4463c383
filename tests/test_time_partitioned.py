"""Time-partitioned corpus layout: a date-bounded query over a corpus
written with write_time_partitioned must prune at the PARTITION level
(directories skipped from metadata, before any I/O) and return exactly
the rows a full-scan timestamp filter returns — the same discipline the
LSH bucket column proves in test_similarity_bucketed.py, applied to the
time axis (the #1 real-cluster cost lever for event/document tables)."""

import os
import re
import shutil

import pytest
from pyspark.sql import functions as F

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark.extras import events as ev

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test", "events_daily")


@pytest.fixture(scope="module")
def daily_path(spark, sf_dir):
    df = ev.load_events(spark, sf_dir)
    shutil.rmtree(TMP, ignore_errors=True)
    ev.write_time_partitioned(df, TMP, ts_col="ts", granularity="day")
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def _partition_filters(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    return (m.group(1) if m else ""), plan


def test_layout_is_partition_dirs(daily_path):
    dirs = [d for d in os.listdir(daily_path) if d.startswith("dt=")]
    assert len(dirs) >= 2, dirs  # the corpus spans multiple days


def test_day_filter_is_partition_filter(spark, daily_path):
    one_day = (
        spark.read.parquet(daily_path)
        .filter(F.col("dt") == "2024-01-02")
    )
    pf, plan = _partition_filters(one_day)
    assert "dt" in pf and "2024-01-02" in pf, plan[:2000]


def test_sessionize_on_pruned_day_matches_full_scan(spark, sf_dir,
                                                    daily_path):
    full = ev.load_events(spark, sf_dir)
    day = F.to_date(F.col("ts")) == F.lit("2024-01-02").cast("date")
    expect = {
        tuple(r)
        for r in ev.sessionize_scalable(full.filter(day)).collect()
    }
    pruned_df = (
        spark.read.parquet(daily_path)
        .filter(F.col("dt") == "2024-01-02")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    sessions = ev.sessionize_scalable(pruned_df)
    got = {tuple(r) for r in sessions.collect()}
    assert got == expect and len(got) > 0
    # and the pruned pipeline's scan really is partition-pruned
    pf, plan = _partition_filters(sessions)
    assert "dt" in pf and "2024-01-02" in pf, plan[:2000]


def test_range_filter_prunes_and_counts_match(spark, sf_dir, daily_path):
    full = ev.load_events(spark, sf_dir)
    lo, hi = "2024-01-02", "2024-01-04"
    expect = full.filter(
        (F.to_date("ts") >= F.lit(lo).cast("date"))
        & (F.to_date("ts") <= F.lit(hi).cast("date"))
    ).count()
    ranged = spark.read.parquet(daily_path).filter(
        (F.col("dt") >= lo) & (F.col("dt") <= hi)
    )
    assert ranged.count() == expect and expect > 0
    pf, plan = _partition_filters(ranged)
    assert "dt" in pf, plan[:2000]


def test_verb_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_dsl")
    t = pdt.Table(ev.load_events(spark, sf_dir), name="events")
    t >> pdt.write_time_partitioned(out, t.ts, granularity="day")
    back = spark.read.parquet(out)
    assert "dt" in back.columns
    assert back.count() == ev.load_events(spark, sf_dir).count()


def test_hour_and_month_granularities(spark, sf_dir, tmp_path):
    df = ev.load_events(spark, sf_dir).limit(500)
    for gran, probe in [("hour", "2024-01-01-00"), ("month", "2024-01-01")]:
        out = str(tmp_path / f"ev_{gran}")
        ev.write_time_partitioned(df, out, granularity=gran)
        got = spark.read.parquet(out).filter(F.col("dt") == probe)
        pf, plan = _partition_filters(got)
        assert "dt" in pf, (gran, plan[:1500])
        assert got.count() > 0

    with pytest.raises(ValueError, match="granularity"):
        ev.time_partition_col(F.col("ts"), "week")
