"""Skew-handling toolkit: heavy-hitter detection and a salted equi-join.

Spark 3+'s AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``)
splits oversized *sort-merge* partitions at runtime and is the first
line of defense.  These helpers cover the cases AQE does not:

- the skewed side must hash-join against a mid-size table that is too
  big to broadcast (AQE skew-split does not apply to shuffled hash
  joins with one giant key);
- the skew is known ahead of time and should be planned, not
  discovered per-stage (e.g. the null key, a bot user, a default id);
- deterministic plans are required (AQE re-plans can differ run to run).

Everything is deterministic: salts come from ``xxhash64`` of the
probe-side row's other columns, never from ``rand()``, so a re-run (or
a recovered task) produces identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "salted_join"]


def heavy_hitters(df: DataFrame, key_cols: list[str], threshold: int,
                  rsd: float = 0.05) -> DataFrame:
    """Keys whose row count exceeds ``threshold``, found with a cheap
    partial-aggregated exact count (one shuffle of (key, partial-count)
    pairs — the map-side combine means the shuffle volume is
    #distinct-keys, not #rows).  Use the result to drive ``salted_join``
    or pre-filtering.  ``rsd`` is accepted for API stability with a
    sketch-based variant; the exact count is used because the follow-up
    decisions (salt / don't salt) are cheap to make exactly.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > threshold)
    )


def _salt_expr(df: DataFrame, key_cols: list[str], n_salt: int) -> Column:
    """Deterministic per-row salt in [0, n_salt) from the non-key columns
    (falls back to the key itself when the row has no other columns —
    still spreads distinct rows, though duplicates of one full row then
    share a salt)."""
    others = [c for c in df.columns if c not in key_cols] or list(key_cols)
    return F.pmod(F.xxhash64(*[F.col(c) for c in others]), F.lit(n_salt))


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                n_salt: int = 16, how: str = "inner",
                skewed: str = "left") -> DataFrame:
    """Equi-join that spreads each skewed-side key over ``n_salt``
    reducers.

    The skewed side gets a deterministic salt in [0, n_salt); the other
    side is replicated ``n_salt`` times (explode of a literal range —
    map-side, no shuffle of its own beyond the join's).  Both sides then
    join on ``on + [salt]``, so one hot key's rows land on ``n_salt``
    different reducers instead of one.

    Cost model: replication multiplies the build side's shuffle volume
    by ``n_salt`` — use for mid-size build sides with a very skewed
    probe side.  (If the build side fits in memory, prefer
    ``F.broadcast``; if both sides are huge AND skewed, salt the
    hotter one and pre-filter the hot keys of the other.)

    Only inner/left joins are supported when ``skewed='left'`` (and
    symmetrically inner/right for ``skewed='right'``): for outer joins
    on the replicated side the n_salt copies would fabricate unmatched
    rows.
    """
    if skewed not in ("left", "right"):
        raise ValueError("skewed must be 'left' or 'right'")
    if skewed == "left" and how not in ("inner", "left"):
        raise ValueError("skewed='left' supports how='inner'|'left'")
    if skewed == "right" and how not in ("inner", "right"):
        raise ValueError("skewed='right' supports how='inner'|'right'")
    salt = "__salt"
    replicate = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")
    ).alias(salt)
    if skewed == "left":
        lt = left.withColumn(salt, _salt_expr(left, on, n_salt))
        rt = right.select("*", replicate)
    else:
        lt = left.select("*", replicate)
        rt = right.withColumn(salt, _salt_expr(right, on, n_salt))
    return lt.join(rt, on=[*on, salt], how=how).drop(salt)
