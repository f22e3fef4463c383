"""Hidden-column / UUID-identity semantics (the reference's core data
model, reference pipe/cache.py:112-116, pipe/verbs.py:448-477): captured
references survive select/drop/rename/overwrite, and names are display
only.  Plus the physical-layout control verbs.
"""

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C


def test_deselected_col_stays_usable(spark):
    t = pdt.Table({"a": [1, 2, 3], "b": [10, 20, 30]}, name="t")
    out = (
        t
        >> pdt.select(t.b)
        >> pdt.filter(t.a > 1)  # a is hidden but the captured ref works
        >> pdt.export(pdt.Pandas)
    )
    assert list(out.columns) == ["b"]
    assert out["b"].tolist() == [20, 30]


def test_rename_swap(spark):
    t = pdt.Table({"a": [1], "b": [2]}, name="t")
    out = t >> pdt.rename({"a": "b", "b": "a"}) >> pdt.export(pdt.Pandas)
    assert out["b"].tolist() == [1] and out["a"].tolist() == [2]


def test_mutate_overwrite_keeps_old_ref(spark):
    t = pdt.Table({"a": [1, 2]}, name="t")
    old_a = t.a
    t2 = t >> pdt.mutate(a=t.a * 10)
    out = t2 >> pdt.mutate(old=old_a) >> pdt.export(pdt.Pandas)
    assert out["a"].tolist() == [10, 20]
    assert out["old"].tolist() == [1, 2]


def test_name_is_display_only_after_rename(spark):
    t = pdt.Table({"a": [5]}, name="t")
    ref = t.a
    t2 = t >> pdt.rename({"a": "z"})
    out = t2 >> pdt.mutate(doubled=ref * 2) >> pdt.export(pdt.Pandas)
    assert out["z"].tolist() == [5] and out["doubled"].tolist() == [10]


def test_hidden_col_through_join(spark):
    a = pdt.Table({"k": [1, 2], "x": [7, 8]}, name="a")
    b = pdt.Table({"k2": [1, 2], "y": [70, 80]}, name="b")
    out = (
        a
        >> pdt.select(a.k)
        >> pdt.inner_join(b, on=a.k == b.k2)
        >> pdt.mutate(sum_=a.x + b.y)  # x was deselected pre-join
        >> pdt.select(C.sum_)
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out["sum_"]) == [77, 88]


def test_repartition_and_broadcast_plan(spark):
    t = pdt.Table({"k": list(range(100)), "v": list(range(100))}, name="t")
    rep = t >> pdt.repartition(t.k, n=8)
    plan = rep >> pdt.build_query()
    assert "hashpartitioning" in plan or "REPARTITION" in plan

    dim = pdt.Table({"k2": [1, 2, 3], "w": [1, 2, 3]}, name="dim")
    joined = t >> pdt.inner_join(dim >> pdt.broadcast(), on=t.k == dim.k2)
    jplan = joined >> pdt.build_query()
    assert "BroadcastHashJoin" in jplan

    few = t >> pdt.coalesce_partitions(1) >> pdt.export(pdt.Spark)
    assert few.rdd.getNumPartitions() == 1
