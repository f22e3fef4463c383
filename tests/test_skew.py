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
