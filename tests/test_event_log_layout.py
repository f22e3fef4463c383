"""Sorted event-log layout (r11, VERDICT r10 next #6): pay the sort
once at ingest — events.write_event_log stages a bucketed catalog table
(one file per bucket, files sorted by (user, ts, prio)) — and every
per-key time-ordered operator over it runs WITHOUT the Exchange and
Sort the same window pays on a plain parquet scan:

- sessionize:            Scan -> Window -> Agg, ZERO shuffles/sorts
- asof_join_colocated:   Scan -> Filter -> Window, ZERO shuffles/sorts
  (both sides of the as-of live in the same table, so the union stage
  of asof_join — which destroys the scan's ordering — is unnecessary)

Results must equal the layout-agnostic operators exactly.
"""

from __future__ import annotations

import os
import re
import shutil

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import events as ev
from pydiverse_transform_spark.extras.asof import (
    asof_join,
    asof_join_colocated,
)

SF_DIR = "/root/testdata/sf0.001"
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test", "evlog")


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def staged(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    df = ev.load_events(spark, SF_DIR)
    prio = (F.when(F.col("event_type") == "purchase", 0)
            .when(F.col("event_type") == "click", 1))
    ev.write_event_log(df, "ev_log_test", by="user_id", on="ts",
                       priority=prio, buckets=8, path=TMP)
    return ev.read_event_log(spark, "ev_log_test")


def test_at_most_one_file_per_bucket(staged):
    data = [f for f in os.listdir(TMP)
            if not f.startswith(("_", ".")) and f.endswith(".parquet")]
    # the sort-order report requires at most ONE file per bucket (an
    # empty bucket writes none) — this IS the layout guarantee
    # read_event_log's conf relies on.  Bucketed file names carry the
    # bucket id as the _NNNNN suffix before .c000
    buckets = [re.search(r"_(\d{5})\.c000", f).group(1) for f in data]
    assert len(buckets) == len(set(buckets)), buckets
    assert 0 < len(buckets) <= 8


def test_sessionize_presorted_is_shuffle_and_sort_free(staged):
    s = ev.sessionize(staged, "user_id", "ts", gap_minutes=30)
    out = (s.select("user_id", "session_id",
                    ev.epoch_us(F.col("ts")).alias("us"))
           .groupBy("user_id", "session_id")
           .agg(F.count(F.lit(1)).alias("n")))
    plan = _final_plan(out)
    assert "Window" in plan
    assert not re.search(r"\bSort\b", plan), plan
    assert not re.search(r"\bExchange\b", plan), plan


def test_asof_colocated_is_shuffle_and_sort_free(staged):
    out = asof_join_colocated(staged, on="ts", by=["user_id"],
                              side_col="event_prio", payload=["value"])
    plan = _final_plan(out)
    assert "Window" in plan
    assert not re.search(r"\bSort\b", plan), plan
    assert not re.search(r"\bExchange\b", plan), plan


def test_asof_colocated_equals_union_asof(spark, staged):
    got = asof_join_colocated(staged, on="ts", by=["user_id"],
                              side_col="event_prio", payload=["value"]) \
        .select("event_id", "ts_right", "value_right")
    df = ev.load_events(spark, SF_DIR)
    clicks = df.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    purchases = df.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    want = asof_join(clicks, purchases, on="ts", by=["user_id"]) \
        .select("event_id", "ts_right",
                F.col("value").alias("value_right"))
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_sessionize_presorted_equals_scalable(spark, staged):
    got = (ev.sessionize(staged, "user_id", "ts", gap_minutes=30)
           .select("user_id", "session_id",
                   ev.epoch_us(F.col("ts")).alias("us"))
           .groupBy("user_id", "session_id")
           .agg(F.min("us").alias("session_start_us"),
                F.max("us").alias("session_end_us"),
                F.count(F.lit(1)).alias("n_events")))
    want = ev.sessionize_scalable(ev.load_events(spark, SF_DIR),
                                  "user_id", "ts", gap_minutes=30,
                                  chunk_minutes=120)
    key = lambda r: (r["user_id"], r["session_id"])  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_colocated_degrades_gracefully_on_unsorted_input(spark):
    """On a plain (un-staged) input the operator is still correct —
    it just pays the ordinary one-shuffle window."""
    df = ev.load_events(spark, SF_DIR)
    prio = (F.when(F.col("event_type") == "purchase", 0)
            .when(F.col("event_type") == "click", 1))
    got = asof_join_colocated(df.withColumn("event_prio", prio),
                              on="ts", by=["user_id"],
                              side_col="event_prio", payload=["value"]) \
        .select("event_id", "ts_right", "value_right")
    clicks = df.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    purchases = df.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    want = asof_join(clicks, purchases, on="ts", by=["user_id"]) \
        .select("event_id", "ts_right",
                F.col("value").alias("value_right"))
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)
