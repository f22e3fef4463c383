"""ColExpr.export and uses_table (reference test_polars_table.py
test_col_export / test_uses_table, adapted to the Pandas bridge).
"""

import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C


@pytest.fixture()
def tables(spark):
    t2 = pdt.from_dict(
        spark,
        {"col1": [0.0, 1.0, 2.0], "col2": [4, 5, 6], "col3": [0.5, 1.5, 2.5]},
        name="t2",
    )
    t3 = pdt.from_dict(spark, {"col1": [9, 8, 7]}, name="t3")
    return t2, t3


def test_col_export_plain(spark, tables):
    t2, _ = tables
    s = t2.col2.export(pdt.Pandas())
    assert list(s) == [4, 5, 6]
    assert s.name == "col2"


def test_expr_export(spark, tables):
    t2, _ = tables
    s = ((t2.col1 + t2.col3) * 2).export(pdt.Pandas())
    assert list(s) == [1.0, 5.0, 9.0]


def test_expr_export_after_mutate(spark, tables):
    t2, _ = tables
    t = t2 >> pdt.mutate(u=t2.col2 * 10)
    s = (t.u + t.col2).export(pdt.Pandas())
    assert list(s) == [44, 55, 66]


def test_export_unrelated_tables_raises(spark, tables):
    t2, t3 = tables
    with pytest.raises(ValueError):
        (t2.col2 + t3.col1).export(pdt.Pandas())


def test_export_pure_literal_raises(spark, tables):
    with pytest.raises(ValueError):
        (pdt.lit(1) + pdt.lit(2)).export(pdt.Pandas())


def test_uses_table(spark, tables):
    t2, t3 = tables
    assert t2.col1.uses_table(t2)
    assert not t2.col1.uses_table(t3)
    assert (t2.col1 == t3.col1).uses_table(t3)
    # a table derived FROM t2 is a different snapshot: refs taken from t2
    # do not use it...
    derived = t2 >> pdt.mutate(x=pdt.lit(0))
    assert not t2.col1.uses_table(derived)
    # ...but refs taken from the derived table DO use t2
    assert derived.x.uses_table(t2)
    assert derived.col1.uses_table(t2)


def test_uses_table_through_join(spark, tables):
    t2, t3 = tables
    j = t2 >> pdt.inner_join(t3, on=t2.col2 == t3.col1)
    assert j.col2.uses_table(t2)
    assert j.col2.uses_table(t3)


def test_table_str_preview(spark, tables):
    t2, _ = tables
    s = str(t2)
    assert "t2" in s and "shape: (3, 3)" in s and "failed" not in s
    assert "failed" not in t2._repr_html_()


def test_col_and_expr_str_preview(spark, tables):
    t2, _ = tables
    assert "failed" not in str(t2.col2)
    assert "failed" not in str(t2.col1 * 2)
    assert "failed" not in (t2.col1 * 2)._repr_html_()
    # un-evaluable expression prints the failure instead of raising
    assert "failed" in str(pdt.lit(1) + pdt.lit(2))
