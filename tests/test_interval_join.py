"""interval_join: bucketized equi-join plan must equal the naive
non-equi join bit-for-bit (pair multiplicity included)."""

import datetime as dt

from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.interval import interval_join


def test_small_inclusive_bounds(spark):
    left = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 10), (3, "b", 7), (4, "a", 100)],
        "id int, k string, t int",
    )
    right = spark.createDataFrame(
        [("a", 4, 6, "r1"), ("a", 10, 20, "r2"), ("b", 0, 50, "r3"),
         ("a", 90, 95, "r4")],
        "k string, s int, e int, tag string",
    )
    got = sorted(
        (r.id, r.tag)
        for r in interval_join(left, right, on="t", start="s", end="e",
                               by=["k"], bucket=3).collect()
    )
    # inclusive both ends; no cross-key matches; 100 matches nothing
    assert got == [(1, "r1"), (2, "r2"), (3, "r3")]


def test_overlapping_intervals_multiplicity(spark):
    left = spark.createDataFrame([(1, 10)], "id int, t int")
    right = spark.createDataFrame(
        [(0, 20, "x"), (5, 15, "y"), (10, 10, "z"), (11, 12, "w")],
        "s int, e int, tag string",
    )
    got = sorted(
        r.tag
        for r in interval_join(left, right, on="t", start="s", end="e",
                               bucket=4).collect()
    )
    # one output row per overlapping interval, degenerate [10,10] included
    assert got == ["x", "y", "z"]


def test_differential_vs_naive_events(spark, sf_dir):
    from pydiverse_transform_spark.extras import events as ev

    df = ev.load_events(spark, sf_dir)
    clicks = df.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    windows = (
        df.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
            F.col("event_id").alias("error_id"),
        )
    )
    got = interval_join(
        clicks, windows, on="ts", start="w_start", end="w_end",
        by=["user_id"], bucket=dt.timedelta(minutes=30),
    ).select("event_id", "error_id")
    naive = clicks.alias("l").join(
        windows.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.ts") >= F.col("r.w_start"))
        & (F.col("l.ts") <= F.col("r.w_end")),
        "inner",
    ).select("event_id", "error_id")
    a = sorted((r.event_id, r.error_id) for r in got.collect())
    b = sorted((r.event_id, r.error_id) for r in naive.collect())
    assert a == b
    assert len(a) > 0


def test_bucket_required_and_width_invariant(spark):
    """bucket= is required (plan-build stays action-free) and the result
    is invariant to the chosen width."""
    import pytest

    left = spark.createDataFrame([(i, i * 3) for i in range(40)],
                                 "id int, t int")
    right = spark.createDataFrame(
        [(i * 5, i * 5 + 8, i) for i in range(20)],
        "s int, e int, rid int",
    )
    with pytest.raises(TypeError):
        interval_join(left, right, on="t", start="s", end="e")
    with pytest.raises(ValueError, match="positive"):
        interval_join(left, right, on="t", start="s", end="e", bucket=0)
    wide = interval_join(left, right, on="t", start="s", end="e", bucket=50)
    fixed = interval_join(left, right, on="t", start="s", end="e", bucket=2)
    a = sorted((r.id, r.rid) for r in wide.collect())
    b = sorted((r.id, r.rid) for r in fixed.collect())
    assert a == b
