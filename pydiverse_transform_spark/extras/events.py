"""Event-stream batch operators: loader, sessionization, window rollups.

``load_events`` schema-sniffs the physical encoding of ``ts`` in
events.parquet (nanosecond int64 via ``nanosAsLong``, or native
``timestamp[us]``) and normalizes to an exact TIMESTAMP_NTZ
(wall-clock, timezone-independent) either way.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
US_PER_MIN = 60_000_000

__all__ = ["load_events", "epoch_us", "sessionize", "sessionize_scalable",
           "tumbling_agg", "ntz_from_epoch_us", "time_partition_col",
           "write_time_partitioned", "write_event_log", "read_event_log"]


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
    """events.parquet with ``ts`` normalized to TIMESTAMP_NTZ (µs).

    The testdata has shipped ``ts`` in two physical encodings across
    driver versions — TIMESTAMP(NANOS), which Spark's vectorized reader
    only surfaces as an int64 via ``nanosAsLong``, and plain
    ``timestamp[us]`` — so we sniff the schema instead of assuming:

    * LongType       → nanosecond integers; truncate ns→µs and rebuild
                       an exact TIMESTAMP_NTZ (what µs-native engines see);
    * Timestamp(NTZ) → already wall-clock µs; cast to TIMESTAMP_NTZ so
                       downstream arithmetic is session-timezone-free.
    """
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        us = _div(F.col("ts"), F.lit(1000))
        return df.withColumn("ts", ntz_from_epoch_us(us))
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


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


def sessionize_scalable(df: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts", gap_minutes: int = 30,
                        chunk_minutes: int | None = None) -> DataFrame:
    """Skew-proof two-level sessionization; returns one row per session
    ``(user, session_id, session_start_us, session_end_us, n_events)``.

    ``sessionize`` windows over *all* of a user's events, so one hot user
    (a bot with 10^9 events in 100 TB) serializes on a single reducer.
    This variant bounds per-task work independently of key skew:

    1. events are bucketed into ``(user, time-chunk)`` and sessionized
       *locally* — the window partition is (user, chunk), so a hot user's
       timeline is spread over many tasks;
    2. local sessions (orders of magnitude fewer rows than events) are
       interval-merged per user: a local session merges with its
       predecessor when the boundary gap is <= the session gap.

    Exact — chunking only ever *splits* sessions at chunk edges, and the
    merge joins exactly those splits back (intervals of one user are
    disjoint and time-ordered), so the result equals ``sessionize``'s
    session set for any chunk size.  Step 2's per-user window is over
    session intervals, whose count per (user, chunk) is bounded by
    chunk_minutes/gap_minutes + 1, not by the user's event count.
    """
    gap_us = gap_minutes * US_PER_MIN
    chunk_us = (chunk_minutes or 32 * gap_minutes) * US_PER_MIN
    us = epoch_us(F.col(ts_col))
    e = df.select(F.col(user_col), us.alias("__us"))
    # exact integer floor-division chunk id (epoch µs overflows double
    # mantissa headroom too easily to trust float floor here)
    e = e.withColumn(
        "__chunk",
        _div(F.col("__us") - F.pmod(F.col("__us"), F.lit(chunk_us)),
             F.lit(chunk_us)),
    )
    w1 = Window.partitionBy(user_col, "__chunk").orderBy("__us")
    prev1 = F.lag("__us").over(w1)
    new1 = F.when(
        prev1.isNull() | ((F.col("__us") - prev1) > gap_us), 1
    ).otherwise(0)
    local = e.withColumn(
        "__ls",
        F.sum(new1).over(
            w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = local.groupBy(user_col, "__chunk", "__ls").agg(
        F.min("__us").alias("__s"),
        F.max("__us").alias("__e"),
        F.count(F.lit(1)).alias("__n"),
    )
    w2 = Window.partitionBy(user_col).orderBy("__s")
    prev_end = F.lag("__e").over(w2)
    new2 = F.when(
        prev_end.isNull() | ((F.col("__s") - prev_end) > gap_us), 1
    ).otherwise(0)
    merged = sessions.withColumn(
        "session_id",
        F.sum(new2).over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return merged.groupBy(user_col, "session_id").agg(
        F.min("__s").alias("session_start_us"),
        F.max("__e").alias("session_end_us"),
        F.sum("__n").alias("n_events"),
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


# --- time-partitioned corpus layout ------------------------------------------
#
# The #1 cost lever on a 100 TB event/document corpus is not reading it
# faster — it is not reading it at all.  Materializing a coarse time key
# as a parquet PARTITION column turns every date-bounded query
# (sessionize a week, doc-stats for one day, backfill a month) into a
# metadata-only directory prune: the scan's PartitionFilters eliminate
# non-matching files before any I/O, exactly like the LSH bucket column
# in extras/similarity.write_bucketed.

_GRANULARITIES = {
    "day": lambda ts: F.to_date(ts),
    "month": lambda ts: F.trunc(F.to_date(ts), "month"),
    # string key: lexicographic order == chronological, and parquet
    # partition values must render into a path (timestamps do not)
    "hour": lambda ts: F.date_format(ts, "yyyy-MM-dd-HH"),
}


def time_partition_col(ts: Column, granularity: str = "day") -> Column:
    """The derived partition key for ``write_time_partitioned`` — also
    what a reader must filter on to get metadata-only pruning (filters
    on the raw timestamp prune row groups via footer stats, but only
    partition-column predicates skip whole directories)."""
    try:
        return _GRANULARITIES[granularity](ts)
    except KeyError:
        raise ValueError(
            f"granularity must be one of {sorted(_GRANULARITIES)}, "
            f"got {granularity!r}"
        ) from None


def write_time_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                           granularity: str = "day",
                           partition_col: str = "dt",
                           mode: str = "overwrite") -> None:
    """Materialize a time-partitioned corpus layout: derive
    ``partition_col`` from ``ts_col`` at the given granularity and write
    it as a parquet partition column.  Readers filter on
    ``partition_col`` (e.g. ``F.col("dt") == "2024-01-02"``) and the
    scan shows the predicate under PartitionFilters — directories for
    other days are never opened (plan proof:
    tests/test_time_partitioned.py)."""
    (
        df.withColumn(partition_col,
                      time_partition_col(F.col(ts_col), granularity))
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_event_log(df: DataFrame, table_name: str, *,
                    by: str = "user_id", on: str = "ts",
                    priority: Column | None = None,
                    priority_col: str = "event_prio",
                    buckets: int = 32, mode: str = "overwrite",
                    path: str | None = None) -> None:
    """Materialize the SORTED EVENT-LOG layout (r11): a bucketed catalog
    table — ``bucketBy(buckets, by)`` + ``sortBy(by, on[, priority])``
    with exactly ONE file per bucket — so every per-key time-ordered
    operator over it (window, sessionize, co-located as-of join) runs
    with NO Exchange (the bucketing satisfies the window's clustered
    distribution) and NO Sort (the file order satisfies the window
    order).  Pay the sort once at ingest, amortize it over every
    downstream query — at 100 TB the events table is written once a day
    and windowed hundreds of times, so this is the layout a production
    event pipeline wants (plan proof: tests/test_event_log_layout.py;
    scale numbers: SCALE_BENCH_r11.json event_log_layout block).

    The one-file-per-bucket guarantee comes from ``repartition(buckets,
    by)`` ahead of the bucketed write: Spark's repartition hash and its
    bucket hash are the same Murmur3 family over the same expression, so
    each task holds exactly one bucket's rows and writes one file —
    the layout :func:`read_event_log` needs for the scan to report its
    sort order.

    ``priority`` (optional) is materialized as ``priority_col`` and
    appended to the sort key: a SMALL INT encoding which event kinds
    must win ties at equal (by, on) — e.g. state-updating events (0)
    before state-reading events (1), the tie order the inclusive
    as-of join needs (see :func:`asof.asof_join_colocated`).  It must
    be a real stored column (not re-derived at read time) because the
    downstream window can only skip its sort when it orders by the
    exact columns the files are sorted by.

    ``path`` makes the table EXTERNAL at that location (keeps staging
    out of the repo/warehouse root); bucketing requires a catalog table
    (Spark restriction), hence ``saveAsTable`` and not a path-only
    parquet write."""
    sort_cols = [by, on]
    if priority is not None:
        df = df.withColumn(priority_col, priority.cast("int"))
        sort_cols.append(priority_col)
    w = (df.repartition(buckets, F.col(by))
         .write.mode(mode)
         .bucketBy(buckets, by).sortBy(*sort_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_event_log(spark: SparkSession, table_name: str) -> DataFrame:
    """Open a :func:`write_event_log` table so downstream windows can
    elide their Exchange AND Sort.  Spark reports a bucketed scan's
    sort order only behind
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (off by
    default since 3.0 because multi-file buckets would need a merge-
    sort to honor it — SPARK-28595); the writer's one-file-per-bucket
    guarantee is exactly the layout where enabling it is free, so this
    reader turns it on for the session."""
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(table_name)
