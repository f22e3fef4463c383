"""asof_join: differential check against a brute-force range join +
edge-case semantics (inclusive match, null payload, tolerance, forward,
no-by global as-of)."""

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.asof import asof_join

T = dt.datetime


@pytest.fixture(scope="module")
def small(spark):
    left = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1, 10)), (2, "a", T(2024, 1, 1, 12)),
         (3, "b", T(2024, 1, 1, 9)), (4, "b", T(2024, 1, 1, 11)),
         (5, "c", T(2024, 1, 1, 8))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", T(2024, 1, 1, 10), 100.0), ("a", T(2024, 1, 1, 11), None),
         ("b", T(2024, 1, 1, 10), 7.0)],
        "k string, ts timestamp, v double",
    )
    return left, right


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_backward_inclusive_and_null_payload(small):
    left, right = small
    got = _rows(asof_join(left, right, on="ts", by=["k"]), "id")
    assert got == [
        # id=1: equal timestamp matches (inclusive)
        (1, "a", T(2024, 1, 1, 10), T(2024, 1, 1, 10), 100.0),
        # id=2: matched row's payload is NULL but it IS the match —
        # must not skip back to the 10:00 row
        (2, "a", T(2024, 1, 1, 12), T(2024, 1, 1, 11), None),
        (3, "b", T(2024, 1, 1, 9), None, None),
        (4, "b", T(2024, 1, 1, 11), T(2024, 1, 1, 10), 7.0),
        (5, "c", T(2024, 1, 1, 8), None, None),
    ]


def test_forward(small):
    left, right = small
    got = _rows(
        asof_join(left, right, on="ts", by=["k"], direction="forward"), "id"
    )
    assert got == [
        (1, "a", T(2024, 1, 1, 10), T(2024, 1, 1, 10), 100.0),
        (2, "a", T(2024, 1, 1, 12), None, None),
        (3, "b", T(2024, 1, 1, 9), T(2024, 1, 1, 10), 7.0),
        (4, "b", T(2024, 1, 1, 11), None, None),
        (5, "c", T(2024, 1, 1, 8), None, None),
    ]


def test_tolerance_voids_far_matches(small):
    left, right = small
    got = _rows(
        asof_join(left, right, on="ts", by=["k"],
                  tolerance=dt.timedelta(minutes=30)),
        "id",
    )
    # id=2 (gap 60min) and id=4 (gap 60min) drop their matches;
    # id=1 (gap 0) keeps its match
    assert got[0] == (1, "a", T(2024, 1, 1, 10), T(2024, 1, 1, 10), 100.0)
    assert got[1] == (2, "a", T(2024, 1, 1, 12), None, None)
    assert got[3] == (4, "b", T(2024, 1, 1, 11), None, None)


def test_no_by_global_asof(spark):
    left = spark.createDataFrame([(1, 10), (2, 25)], "id int, t int")
    right = spark.createDataFrame([(9, "x"), (20, "y")], "t int, s string")
    got = _rows(asof_join(left, right, on="t"), "id")
    assert got == [(1, 10, 9, "x"), (2, 25, 20, "y")]


def test_suffix_collision(spark):
    left = spark.createDataFrame([(1, 10, 0.0)], "id int, t int, v double")
    right = spark.createDataFrame([(5, 9.5)], "t int, v double")
    out = asof_join(left, right, on="t")
    assert out.columns == ["id", "t", "v", "t_right", "v_right"]
    assert _rows(out, "id") == [(1, 10, 0.0, 5, 9.5)]


def test_differential_vs_bruteforce_events(spark, sf_dir):
    from pydiverse_transform_spark.extras import events as ev

    df = ev.load_events(spark, sf_dir)
    left = df.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts")
    right = df.filter(F.col("event_type") == "error") \
        .select("user_id", "ts", "value")

    got = asof_join(left, right, on="ts", by=["user_id"])

    # brute force: range join + keep max right.ts per left row
    # ((user_id, ts) pairs are unique in the testdata so max(ts) is
    # a complete tie-break)
    r = right.select(
        F.col("user_id").alias("r_uid"), F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    joined = left.join(
        r, (left.user_id == r.r_uid) & (r.r_ts <= left.ts), "left"
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("r_ts").desc_nulls_last()
    )
    expected = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "user_id", "ts",
            F.col("r_ts").alias("ts_right"),
            F.col("r_value").alias("value"),
        )
    )
    assert _rows(got, "event_id") == _rows(expected, "event_id")


def test_dsl_verbs(spark, sf_dir):
    import pydiverse_transform_spark as pdt
    from pydiverse_transform_spark.extras import events as ev

    df = ev.load_events(spark, sf_dir)
    clicks = pdt.Table(
        df.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts"), "clicks")
    purchases = pdt.Table(
        df.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value"), "purchases")

    out = (
        clicks
        >> pdt.asof_join(purchases, on="ts", by=["user_id"])
        >> pdt.filter(pdt.C.ts_right.is_not_null())
        >> pdt.summarize(n=pdt.count())
        >> pdt.export(pdt.Scalar)
    )
    raw = asof_join(
        df.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts"),
        df.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value"),
        on="ts", by=["user_id"],
    ).filter(F.col("ts_right").isNotNull()).count()
    assert out == raw

    windows = pdt.Table(
        df.filter(F.col("event_type") == "error").select(
            "user_id", F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("w_end"),
        ), "windows")
    n = (
        clicks
        >> pdt.interval_join(windows, on="ts", start="w_start",
                             end="w_end", by=["user_id"],
                             bucket=dt.timedelta(hours=4))
        >> pdt.summarize(n=pdt.count())
        >> pdt.export(pdt.Scalar)
    )
    assert n > 0


def test_scalable_matches_plain_on_events(spark, sf_dir):
    from pydiverse_transform_spark.extras import events as ev
    from pydiverse_transform_spark.extras.asof import asof_join_scalable

    df = ev.load_events(spark, sf_dir)
    left = df.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    right = df.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")

    plain = _rows(asof_join(left, right, on="ts", by=["user_id"]),
                  "event_id")
    for chunk in (dt.timedelta(hours=6), dt.timedelta(days=3)):
        got = _rows(
            asof_join_scalable(left, right, on="ts", by=["user_id"],
                               chunk=chunk),
            "event_id",
        )
        assert got == plain

    fw_plain = _rows(
        asof_join(left, right, on="ts", by=["user_id"],
                  direction="forward"), "event_id")
    fw = _rows(
        asof_join_scalable(left, right, on="ts", by=["user_id"],
                           direction="forward",
                           chunk=dt.timedelta(hours=6)), "event_id")
    assert fw == fw_plain

    tol_plain = _rows(
        asof_join(left, right, on="ts", by=["user_id"],
                  tolerance=dt.timedelta(hours=12)), "event_id")
    tol = _rows(
        asof_join_scalable(left, right, on="ts", by=["user_id"],
                           tolerance=dt.timedelta(hours=12),
                           chunk=dt.timedelta(hours=6)), "event_id")
    assert tol == tol_plain


def test_scalable_hot_key_numeric(spark):
    """One key owning nearly every row — the shape the two-level variant
    exists for; numeric time line with explicit chunk."""
    left = spark.createDataFrame(
        [(i, "hot", 10 * i + 5) for i in range(200)]
        + [(1000, "cold", 55)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("hot", 40 * j, float(j)) for j in range(50)]
        + [("cold", 50, -1.0)],
        "k string, t long, v double",
    )
    from pydiverse_transform_spark.extras.asof import asof_join_scalable

    plain = _rows(asof_join(left, right, on="t", by=["k"]), "id")
    got = _rows(
        asof_join_scalable(left, right, on="t", by=["k"], chunk=64), "id"
    )
    assert got == plain


def test_scalable_rejects_fractional_on(spark):
    from pydiverse_transform_spark.extras.asof import asof_join_scalable

    left = spark.createDataFrame([(1, 1.5)], "id int, t double")
    right = spark.createDataFrame([(1.0, "x")], "t double, s string")
    with pytest.raises(ValueError, match="integer"):
        asof_join_scalable(left, right, on="t", chunk=2)
