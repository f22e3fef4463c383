"""Event-stream batch operators: loader, sessionization, window rollups.

The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
vectorized parquet reader rejects; ``load_events`` flips the
``nanosAsLong`` switch and rebuilds an exact TIMESTAMP_NTZ (wall-clock,
timezone-independent) from the integer nanoseconds.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
US_PER_MIN = 60_000_000

__all__ = ["load_events", "epoch_us", "sessionize", "tumbling_agg",
           "ntz_from_epoch_us"]


def _div(a: Column, b: Column) -> Column:
    return F.call_function("div", a, b)


def ntz_from_epoch_us(us: Column) -> Column:
    """Exact TIMESTAMP_NTZ from epoch microseconds — no session-timezone
    dependency (timestamp_micros would yield a TZ-local timestamp).

    The day count uses FLOOR division so it is consistent with the
    positive pmod remainder — a truncating div would reconstruct
    pre-1970 timestamps one day late (e.g. us=-1 must give
    1969-12-31T23:59:59.999999)."""
    rem = F.pmod(us, F.lit(US_PER_DAY))
    # (us - rem) is exactly divisible; the quotient is a small day count,
    # so the double division below is exact
    d = F.date_add(F.lit(_dt.date(1970, 1, 1)),
                   ((us - rem) / F.lit(US_PER_DAY)).cast("int"))
    hours = _div(rem, F.lit(US_PER_HOUR)).cast("int")
    mins = F.pmod(_div(rem, F.lit(US_PER_MIN)), F.lit(60)).cast("int")
    secs = F.pmod(rem, F.lit(US_PER_MIN)).cast("decimal(20,6)") / F.lit(1_000_000)
    return F.make_timestamp_ntz(
        F.year(d), F.month(d), F.dayofmonth(d), hours, mins, secs
    )


def epoch_us(ts: Column) -> Column:
    """Wall-clock epoch microseconds from TIMESTAMP/TIMESTAMP_NTZ."""
    return (
        F.datediff(F.to_date(ts), F.lit(_dt.date(1970, 1, 1))).cast("long")
        * F.lit(US_PER_DAY)
        + F.hour(ts).cast("long") * F.lit(US_PER_HOUR)
        + F.minute(ts).cast("long") * F.lit(US_PER_MIN)
        + (F.date_part(F.lit("SECOND"), ts) * F.lit(1_000_000)).cast("long")
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet with ``ts`` as TIMESTAMP_NTZ (µs, truncated from ns,
    matching what µs-native engines see)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = _div(F.col("ts"), F.lit(1000))
    return df.withColumn("ts", ntz_from_epoch_us(us))


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds the gap.  One shuffle on user_id;
    at scale, skew on hot users is handled by AQE skew-join settings or
    pre-salting before the window."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = epoch_us(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > gap_minutes * US_PER_MIN), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def tumbling_agg(df: DataFrame, ts_col: str = "ts", every_minutes: int = 60,
                 keys: list[str] | None = None) -> DataFrame:
    """Tumbling-window rollup on an integer bucket of wall-clock time
    (engine-portable, unlike timezone-dependent date_trunc)."""
    bucket = _div(epoch_us(F.col(ts_col)),
                  F.lit(every_minutes * US_PER_MIN)).alias("bucket")
    gcols = [bucket, *(F.col(k) for k in (keys or []))]
    return (
        df.groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .withColumn(
            "window_start",
            ntz_from_epoch_us(F.col("bucket") * F.lit(every_minutes * US_PER_MIN)),
        )
    )
