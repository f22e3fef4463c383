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


def test_map_groups(spark):
    t = pdt.Table(
        {"g": [1, 1, 1, 2, 2], "v": [1.0, 2.0, 3.0, 10.0, 30.0]}, name="t"
    )

    def normalize(pdf):
        pdf = pdf.copy()
        pdf["v_norm"] = (pdf["v"] - pdf["v"].mean()) / (pdf["v"].std() or 1.0)
        return pdf[["g", "v", "v_norm"]]

    out = (
        t
        >> pdt.group_by(t.g)
        >> pdt.map_groups(
            normalize,
            {"g": pdt.Int64(), "v": pdt.Float64(), "v_norm": pdt.Float64()},
        )
        >> pdt.export(pdt.Pandas)
    )
    assert len(out) == 5
    g1 = out[out["g"] == 1].sort_values("v")
    assert abs(g1["v_norm"].mean()) < 1e-9


def test_map_batches(spark):
    t = pdt.Table({"x": [1, 2, 3, 4]}, name="t")

    def double(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["y"] = pdf["x"] * 2
            yield pdf[["x", "y"]]

    out = (
        t
        >> pdt.map_batches(double, {"x": pdt.Int64(), "y": pdt.Int64()})
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out["y"]) == [2, 4, 6, 8]


def test_approx_sketches(spark, sf_dir):
    li = pdt.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    out = (
        li
        >> pdt.group_by(li.l_returnflag)
        >> pdt.summarize(
            nd=li.l_suppkey.n_distinct(),
            and_=li.l_suppkey.approx_n_distinct(),
            q50=li.l_quantity.approx_quantile(0.5),
        )
        >> pdt.export(pdt.Pandas)
    )
    # HLL estimate within 10% of exact; median within the value domain
    assert ((out["and_"] - out["nd"]).abs() <= 0.1 * out["nd"] + 2).all()
    assert out["q50"].between(1, 50).all()
