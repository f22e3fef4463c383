"""salted_join must produce exactly the rows of a plain join, for every
supported join type, including null keys and a pathologically hot key."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.skew import heavy_hitters, salted_join


@pytest.fixture(scope="module")
def sides(spark):
    # hot key 1 (1000 rows), cold keys 2..50, a null key, and left keys
    # with no match (60) / right keys with no match (61)
    left = spark.createDataFrame(
        [(1, i) for i in range(1000)]
        + [(k, k * 10) for k in range(2, 51)]
        + [(None, -1), (60, 0)],
        "k int, lv int",
    )
    right = spark.createDataFrame(
        [(1, "hot-a"), (1, "hot-b")]
        + [(k, f"r{k}") for k in range(2, 51)]
        + [(None, "null-side"), (61, "nomatch")],
        "k int, rv string",
    )
    return left, right


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.mark.parametrize("how,skewed", [
    ("inner", "left"), ("left", "left"), ("inner", "right"),
    ("right", "right"),
])
def test_matches_plain_join(sides, how, skewed):
    left, right = sides
    plain = left.join(right, on=["k"], how=how)
    salted = salted_join(left, right, on=["k"], n_salt=7, how=how,
                         skewed=skewed)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_unsupported_outer_raises(sides):
    left, right = sides
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="right", skewed="left")


def test_salt_spreads_hot_key(sides, spark):
    left, _ = sides
    from pydiverse_transform_spark.extras.skew import _salt_expr

    salts = (
        left.filter(F.col("k") == 1)
        .select(_salt_expr(left, ["k"], 8).alias("s"))
        .distinct()
        .count()
    )
    assert salts == 8  # 1000 hot rows hit every one of the 8 salts


def test_heavy_hitters(sides):
    left, _ = sides
    hh = heavy_hitters(left, ["k"], threshold=100)
    assert [(r.k, r.n_rows) for r in hh.collect()] == [(1, 1000)]


def test_salted_join_bounds_reducer_input(spark):
    """The 100-TB property the toolkit exists for: with one key owning
    ~30% of the probe side, a plain shuffled join funnels all hot rows
    into ONE reducer task (max partition ~= hot-key count), while the
    salted join spreads them over n_salt reducers — max post-shuffle
    partition drops by ~n_salt.  AQE coalescing/skew-split and
    auto-broadcast are disabled so the measured partitioning is the
    static plan's, not a runtime rescue."""
    n_salt = 8
    hot = 30_000
    cold = 70_000
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # enough reducers that distinct (k, salt) groups rarely share a
        # partition — we are measuring the salt spread, not hash
        # collisions between groups
        "spark.sql.shuffle.partitions": "256",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(hot + cold).select(
            F.when(F.col("id") < hot, F.lit(0))
            .otherwise((F.col("id") % 997) + 1).alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(998).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv"),
        )

        def max_partition_rows(df):
            sizes = (df.withColumn("__pid", F.spark_partition_id())
                     .groupBy("__pid").count().collect())
            return max(r["count"] for r in sizes)

        naive_max = max_partition_rows(left.join(right, on=["k"]))
        salted_max = max_partition_rows(
            salted_join(left, right, on=["k"], n_salt=n_salt)
        )
        # naive: every hot row in one reducer
        assert naive_max >= hot, naive_max
        # salted: hot key split across n_salt reducers (slack for cold
        # keys and a few hot salt-groups hash-colliding onto one
        # partition — 3x tolerates any plausible co-location without
        # letting an unsalted plan pass)
        assert salted_max <= 3 * hot / n_salt + cold / 16, (
            naive_max, salted_max
        )
        # structural check, independent of partition-size luck: the hot
        # key's rows must actually land on many distinct partitions
        hot_parts = (
            salted_join(left, right, on=["k"], n_salt=n_salt)
            .where(F.col("k") == 0)
            .select(F.spark_partition_id().alias("__pid"))
            .distinct().count()
        )
        assert hot_parts >= n_salt // 2, hot_parts
        assert salted_max < naive_max / 3, (naive_max, salted_max)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
