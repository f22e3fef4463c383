"""sessionize_scalable must equal the naive single-window sessionize for
ANY chunk size — including a pathologically small one that forces a
session split (and merge) at nearly every chunk boundary."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import events as ev


def _naive_sessions(df, gap_minutes):
    s = ev.sessionize(df, "user_id", "ts", gap_minutes=gap_minutes)
    return (
        s.withColumn("__us", ev.epoch_us(F.col("ts")))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("__us").alias("session_start_us"),
            F.max("__us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@pytest.mark.parametrize("chunk_minutes", [1, 7, 120, 100_000])
def test_matches_naive_any_chunk(spark, sf_dir, chunk_minutes):
    df = ev.load_events(spark, sf_dir)
    naive = _naive_sessions(df, 30).orderBy("user_id", "session_id")
    scal = ev.sessionize_scalable(
        df, "user_id", "ts", gap_minutes=30, chunk_minutes=chunk_minutes
    ).orderBy("user_id", "session_id")
    assert [(f.name, f.dataType) for f in naive.schema] == [
        (f.name, f.dataType) for f in scal.schema
    ]
    a = [tuple(r) for r in naive.collect()]
    b = [tuple(r) for r in scal.collect()]
    assert a == b


def test_hot_key_spreads_over_chunks(spark):
    # one user, 10k events 1 min apart: naive puts them in ONE window
    # partition; scalable must spread stage-1 work over many (user, chunk)
    # groups and still return a single merged session.
    rows = [(1, i * 60_000_000) for i in range(10_000)]
    df = (
        spark.createDataFrame(rows, "user_id int, us long")
        .withColumn("ts", ev.ntz_from_epoch_us(F.col("us")))
        .drop("us")
    )
    out = ev.sessionize_scalable(
        df, "user_id", "ts", gap_minutes=30, chunk_minutes=60
    ).collect()
    assert len(out) == 1
    (r,) = out
    assert r.n_events == 10_000
    assert r.session_start_us == 0
    assert r.session_end_us == 9_999 * 60_000_000
