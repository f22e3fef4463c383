"""Globally range-sorted sink (sources/sinks.py write_sorted): total
order across output files, tight per-file min/max, content preserved."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

import pydiverse_transform_spark as pdt

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test", "sorted_orders")


@pytest.fixture(scope="module")
def sorted_path(spark, sf_dir):
    t = pdt.read_parquet(spark, f"{sf_dir}/orders.parquet", name="orders")
    shutil.rmtree(TMP, ignore_errors=True)
    t >> pdt.write_sorted(TMP, "o_orderkey", num_files=8)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def _file_ranges(spark, path):
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        r = (
            spark.read.parquet(f)
            .agg(F.min("o_orderkey").alias("lo"),
                 F.max("o_orderkey").alias("hi"),
                 F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        if r["n"]:
            ranges.append((r["lo"], r["hi"], r["n"]))
    return ranges


def test_files_have_disjoint_ordered_ranges(spark, sorted_path):
    ranges = sorted(_file_ranges(spark, sorted_path))
    assert len(ranges) >= 2  # range partitioner actually split the data
    for (_, hi_prev, _), (lo_next, _, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, ranges


def test_rows_sorted_within_each_file(spark, sorted_path):
    for f in glob.glob(os.path.join(sorted_path, "part-*.parquet"))[:3]:
        keys = [r["o_orderkey"]
                for r in spark.read.parquet(f).select("o_orderkey").collect()]
        assert keys == sorted(keys)


def test_content_preserved(spark, sf_dir, sorted_path):
    orig = spark.read.parquet(f"{sf_dir}/orders.parquet")
    back = spark.read.parquet(sorted_path)
    assert back.count() == orig.count()
    a = orig.agg(F.sum("o_orderkey"),
                 F.sum(F.crc32(F.col("o_orderpriority")))).collect()
    b = back.agg(F.sum("o_orderkey"),
                 F.sum(F.crc32(F.col("o_orderpriority")))).collect()
    assert a == b


def test_range_filter_skips_files(spark, sorted_path):
    """A narrow key-range predicate must touch a subset of files: with
    disjoint per-file ranges, parquet footer stats let the scan skip the
    rest.  Verified via the number of files whose range intersects."""
    ranges = _file_ranges(spark, sorted_path)
    lo, hi = ranges[0][0], ranges[0][1]  # exactly the first file's range
    touching = [r for r in ranges if not (r[1] < lo or r[0] > hi)]
    assert len(touching) == 1
    got = spark.read.parquet(sorted_path).filter(
        F.col("o_orderkey").between(lo, hi)
    ).count()
    assert got == ranges[0][2]


def test_descending_sort(spark, sf_dir):
    tmp = TMP + "_desc"
    t = pdt.read_parquet(spark, f"{sf_dir}/orders.parquet", name="orders")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        t >> pdt.write_sorted(tmp, "o_orderkey", num_files=4,
                              descending=True)
        for f in glob.glob(os.path.join(tmp, "part-*.parquet"))[:2]:
            keys = [r["o_orderkey"] for r in
                    spark.read.parquet(f).select("o_orderkey").collect()]
            assert keys == sorted(keys, reverse=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
