"""Bucketed co-located join: two tables written with identical
bucket_by join WITHOUT a shuffle — the physical plan has no Exchange
above either scan.  This is the 100-TB fact-fact join strategy
(pre-shuffle once at write time, join shuffle-free forever after).
"""

import re

import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffled join path so the test proves bucketing (not
    broadcasting) removed the exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _fresh_table(spark, name):
    """Drop catalog entry AND stale warehouse dir — a new session's
    empty in-memory catalog can collide with a previous session's
    leftover managed-table location."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        f"{loc.removeprefix('file:')}/{name}", ignore_errors=True
    )


def test_bucketed_join_no_shuffle(spark, sf_dir, no_broadcast):
    _fresh_table(spark, "bj_orders")
    _fresh_table(spark, "bj_lineitem")
    o = pdt.read_parquet(spark, f"{sf_dir}/orders.parquet")
    li = pdt.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    (o >> pdt.select(o.o_orderkey, o.o_orderpriority)
       >> pdt.save_as_table("bj_orders", mode="overwrite",
                            bucket_by=(8, ["o_orderkey"]),
                            sort_by=["o_orderkey"]))
    (li >> pdt.select(li.l_orderkey, li.l_quantity)
        >> pdt.save_as_table("bj_lineitem", mode="overwrite",
                             bucket_by=(8, ["l_orderkey"]),
                             sort_by=["l_orderkey"]))

    bo = pdt.read_table(spark, "bj_orders")
    bl = pdt.read_table(spark, "bj_lineitem")
    joined = bl >> pdt.inner_join(bo, on=bl.l_orderkey == bo.o_orderkey)
    plan = joined >> pdt.build_query()
    phys = plan[plan.find("== Physical Plan =="):]
    assert "SortMergeJoin" in phys, phys
    # bucketed on the join key on both sides: no shuffle anywhere
    assert "Exchange" not in phys, phys

    # and the result is still correct
    n = (
        joined
        >> pdt.summarize(n=pdt.count())
        >> pdt.export(pdt.Scalar)
    )
    plain = (
        li
        >> pdt.inner_join(o, on=li.l_orderkey == o.o_orderkey)
        >> pdt.summarize(n=pdt.count())
        >> pdt.export(pdt.Scalar)
    )
    assert n == plain


def test_unbucketed_same_join_does_shuffle(spark, sf_dir, no_broadcast):
    """Control: the identical join on plain parquet has Exchanges."""
    o = pdt.read_parquet(spark, f"{sf_dir}/orders.parquet")
    li = pdt.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    joined = li >> pdt.inner_join(o, on=li.l_orderkey == o.o_orderkey)
    plan = joined >> pdt.build_query()
    phys = plan[plan.find("== Physical Plan =="):]
    assert "Exchange" in phys, phys
