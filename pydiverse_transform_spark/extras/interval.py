"""Interval (range) join — point-in-interval matching at scale.

``interval_join(left, right, on, start, end, by)`` returns every
(left, right) pair with ``right.start <= left.on <= right.end`` (and
equal ``by`` keys).  The naive Spark plan for this predicate is a
BroadcastNestedLoopJoin — quadratic work unless one side broadcasts.

Scale path — *bucketized equi-join*:

1. pick a bucket width ``W`` (required ``bucket=``; a good choice is
   the p95 interval length of the right side);
2. each right interval is replicated to the ``⌈len/W⌉+1`` buckets it
   overlaps (``sequence`` + ``explode`` — JVM-side, no Python);
3. each left point maps to exactly ONE bucket, so the equi-join on
   ``(by…, bucket)`` produces each true pair exactly once — no
   post-join dedup — plus a residual exact range filter.

The shuffle is on ``(by, bucket)``: bounded replication instead of an
all-pairs product, and AQE handles residual bucket skew.  This is the
same discretize-then-equi-join idea the MinHash-LSH dedup uses for
similarity, applied to time ranges.

Timestamps are bucketized on exact wall-clock epoch-microseconds
(``extras.events.epoch_us``), so semantics are timezone-free and match
a DuckDB ``BETWEEN`` oracle bit-for-bit.

Reference repo has no range join; beyond-reference operator.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .events import epoch_us

__all__ = ["interval_join"]

_BUCKET = "__iv_bucket__"


def _to_long(df: DataFrame, col: str) -> Column:
    """Numeric line for bucketization: epoch-µs for timestamps/dates,
    the value itself for numerics."""
    t = df.schema[col].dataType
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return epoch_us(F.col(col))
    if isinstance(t, T.DateType):
        return epoch_us(F.col(col).cast("timestamp_ntz"))
    return F.col(col).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    start: str,
    end: str,
    by: list[str] | None = None,
    *,
    bucket,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of left points to right intervals:
    ``start <= on <= end`` (inclusive both ends) AND equal ``by`` keys.

    ``bucket`` — bucket width (required): a ``datetime.timedelta`` for
    timestamp/date columns or a number for numeric ones.  A good choice
    is the p95 interval length of the right side
    (``right.select(percentile_approx(end - start, 0.95))``); making the
    caller pass it keeps plan construction action-free — building the
    join never triggers a Spark job (asserted in
    ``tests/test_extras_plans.py``), same contract as
    ``similarity.py``'s ``dim=``.

    Columns of ``right`` colliding with ``left`` names are renamed with
    ``suffix``.
    """
    by = list(by or [])

    if isinstance(bucket, _dt.timedelta):
        bucket_us = int(bucket / _dt.timedelta(microseconds=1))
    else:
        bucket_us = int(bucket)
    if bucket_us <= 0:
        raise ValueError(
            f"interval_join: bucket must be positive, got {bucket!r}"
        )

    left_names = set(left.columns)
    renames = {
        c: (c + suffix if c in left_names else c)
        for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(renames[c]) for c in right.columns],
        F.explode(
            F.sequence(
                F.floor(_to_long(right, start) / F.lit(bucket_us)),
                F.floor(_to_long(right, end) / F.lit(bucket_us)),
            )
        ).alias(_BUCKET),
    )
    l = left.withColumn(  # noqa: E741
        _BUCKET, F.floor(_to_long(left, on) / F.lit(bucket_us))
    )

    cond = l[_BUCKET] == r[_BUCKET]
    for k in by:
        cond = cond & (l[k] == r[renames[k]])
    out = l.join(r, cond, "inner").filter(
        (l[on] >= r[renames[start]]) & (l[on] <= r[renames[end]])
    )
    drop = [r[renames[k]] for k in by]
    return out.drop(l[_BUCKET]).drop(r[_BUCKET]).drop(*drop)
