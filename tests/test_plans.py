"""Plan-regression tests: lock in the physical-plan properties that make
pipelines survive a 100x scale-up — filter pushdown to the parquet scan,
column pruning, map-side partial aggregation, top-k without a global sort,
single-shuffle windows, and automatic broadcast of small dimensions.

These assert on the *executed/physical plan text*, so a regression in the
compiler (e.g. an expression form that blocks pushdown, or an extra
exchange) fails here long before it shows up as a slow bench number.
"""

import datetime as dt
import re

import pytest

import pydiverse_transform_spark as pdt


def _plan(t):
    return t >> pdt.build_query()


def _final_plan_section(plan: str) -> str:
    """The physical-plan part of queryExecution().toString()."""
    i = plan.find("== Physical Plan ==")
    return plan[i:] if i >= 0 else plan


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return pdt.read_parquet(spark, f"{sf_dir}/lineitem.parquet")


def test_filter_pushdown_reaches_scan(li):
    t = (
        li
        >> pdt.filter(li.l_shipdate <= pdt.lit(dt.datetime(1998, 9, 2)))
        >> pdt.select(li.l_returnflag, li.l_quantity)
    )
    plan = _plan(t)
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan


def test_column_pruning_reaches_scan(li):
    t = li >> pdt.select(li.l_returnflag, li.l_quantity)
    plan = _plan(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # 2 of lineitem's 11 columns — anything more means pruning broke
    assert cols == {"l_returnflag", "l_quantity"}


def test_groupby_partial_aggregation_single_shuffle(li):
    t = (
        li
        >> pdt.group_by(li.l_returnflag)
        >> pdt.summarize(q=li.l_quantity.sum())
    )
    plan = _final_plan_section(_plan(t))
    # partial + final HashAggregate around exactly one shuffle
    assert len(re.findall(r"\bHashAggregate\b", plan)) >= 2, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_arrange_slice_head_is_topk_not_global_sort(li):
    t = (
        li
        >> pdt.arrange(li.l_extendedprice.descending())
        >> pdt.slice_head(10)
        >> pdt.select(li.l_orderkey, li.l_extendedprice)
    )
    plan = _final_plan_section(_plan(t))
    # per-partition heap + merge, NOT an Exchange rangepartitioning + Sort
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_window_in_mutate_single_shuffle(li):
    t = (
        li
        >> pdt.group_by(li.l_orderkey)
        >> pdt.mutate(
            r=pdt.row_number(arrange=li.l_linenumber),
            share=li.l_quantity / li.l_quantity.sum(),
        )
        >> pdt.ungroup()
    )
    plan = _final_plan_section(_plan(t))
    # both the row_number window and the agg-over-window share one
    # hashpartitioning shuffle on l_orderkey
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Window" in plan, plan


def test_small_dim_join_auto_broadcasts(spark, sf_dir, li):
    """No explicit hint: Catalyst must pick BroadcastHashJoin for the
    small side from parquet statistics alone."""
    supplier = pdt.read_parquet(spark, f"{sf_dir}/supplier.parquet")
    t = li >> pdt.inner_join(supplier, on=li.l_suppkey == supplier.s_suppkey)
    plan = _final_plan_section(_plan(t))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_summarize_then_filter_is_post_agg_filter(li):
    """filter after summarize must not re-shuffle (HAVING shape)."""
    t = li >> pdt.group_by(li.l_returnflag) >> pdt.summarize(
        q=li.l_quantity.sum()
    )
    t = t >> pdt.filter(t.q > 1000)
    plan = _final_plan_section(_plan(t))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_cosine_topk_plan_is_topk(spark, sf_dir):
    from pydiverse_transform_spark.extras.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    out = cosine_topk(emb, [0.1] * dim, k=5)
    plan = out._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_whole_stage_codegen_covers_expressions(li):
    """Expression-heavy mutate stays inside WholeStageCodegen (no
    Python/UDF eval nodes anywhere in the plan)."""
    t = li >> pdt.mutate(
        x=(li.l_extendedprice * (1 - li.l_discount)).round(2),
        y=li.l_returnflag.str.upper().str.slice(0, 5),
        z=pdt.when(li.l_quantity > 25).then(1).otherwise(0),
    )
    plan = _final_plan_section(_plan(t))
    # codegen stages show as `*(n)` node prefixes in the plan string
    assert re.search(r"\*\(\d+\) Project", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q21_single_lineitem_scan(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS decorrelation must stay a windowed
    single pass: exactly one lineitem scan, no groupBy+self-join."""
    import __spark_entry__ as se

    df = se.queries()["q21_waiting_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    phys = _final_plan_section(plan)
    assert phys.count("lineitem.parquet") == 1, phys


def test_q02_window_min_single_pass(spark, sf_dir):
    """Q2's correlated-min decorrelation: one lineitem scan feeding a
    window min, and the final LIMIT is top-k (no global sort)."""
    import __spark_entry__ as se

    df = se.queries()["q02_min_cost_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    phys = _final_plan_section(plan)
    assert phys.count("lineitem.parquet") == 1, phys
    assert "TakeOrderedAndProject" in phys, phys
