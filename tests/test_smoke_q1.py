"""Phase-0 vertical slice: TPC-H Q1 shape end-to-end (SURVEY §7)."""

import datetime as dt

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C


def test_q1(spark, sf_dir):
    li = pdt.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    out = (
        li
        >> pdt.filter(li.l_shipdate <= pdt.lit(dt.datetime(1998, 9, 2)))
        >> pdt.group_by(li.l_returnflag, li.l_linestatus)
        >> pdt.summarize(
            sum_qty=li.l_quantity.sum(),
            sum_base_price=li.l_extendedprice.sum(),
            sum_disc_price=(li.l_extendedprice * (1 - li.l_discount)).sum(),
            sum_charge=(
                li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax)
            ).sum(),
            avg_qty=li.l_quantity.mean(),
            avg_price=li.l_extendedprice.mean(),
            avg_disc=li.l_discount.mean(),
            count_order=pdt.count(),
        )
        >> pdt.arrange(C.l_returnflag, C.l_linestatus)
        >> pdt.export(pdt.Pandas)
    )
    assert len(out) > 0
    assert list(out.columns) == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order",
    ]
    # cross-check one aggregate against a raw Spark computation
    import pyspark.sql.functions as F

    raw = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= F.lit(dt.datetime(1998, 9, 2)))
        .agg(F.sum("l_quantity")).collect()[0][0]
    )
    assert abs(out["sum_qty"].sum() - raw) < 1e-6


def test_mutate_select_filter(spark, sf_dir):
    li = pdt.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    t = (
        li
        >> pdt.mutate(revenue=li.l_extendedprice * (1 - li.l_discount))
        >> pdt.filter(C.revenue > 1000.0)
        >> pdt.select(li.l_orderkey, C.revenue)
    )
    pdf = t >> pdt.export(pdt.Pandas)
    assert list(pdf.columns) == ["l_orderkey", "revenue"]
    assert (pdf["revenue"] > 1000.0).all()
