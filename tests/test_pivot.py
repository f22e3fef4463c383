"""pivot_wider / pivot_longer differential tests vs DuckDB + edge cases:
null pivot keys, bool any/all aggregation, LCA type unification in the
melt, plan shapes, and error paths."""

import duckdb
import pyarrow as pa
import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C

from oracle_util import compare

DATA = {
    "k": ["a", "a", "b", "b", "b", None],
    "s": ["x", "y", "x", None, "x", "y"],
    "v": [1.5, 2.0, None, 4.0, 8.5, 16.0],
    "b": [True, False, True, None, False, True],
}


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    con.register("t", pa.table(DATA))
    return con


@pytest.fixture()
def tbl(spark):
    return pdt.from_dict(spark, DATA, name="t")


def _check(con, table, sql, name):
    ok, msg = compare(table >> pdt.export(pdt.Spark), con, sql, name)
    assert ok, msg


def test_pivot_wider_sum_null_keys(spark, con, tbl):
    """NULL grouping keys keep their own row; NULL pivot names match no
    value column (never equal to any literal)."""
    out = (
        tbl
        >> pdt.group_by(tbl.k)
        >> pdt.pivot_wider(names_from=tbl.s, values_from=tbl.v,
                           values=["x", "y"], name_fmt="v_{}")
    )
    _check(con, out, """
        SELECT k,
               sum(CASE WHEN s = 'x' THEN v END) AS v_x,
               sum(CASE WHEN s = 'y' THEN v END) AS v_y
        FROM t GROUP BY k
    """, "pivot_sum")


def test_pivot_wider_any_global(spark, con, tbl):
    """No group_by => one global row; bool aggs."""
    out = tbl >> pdt.pivot_wider(
        names_from=tbl.s, values_from=tbl.b, values=["x", "y"],
        agg="any", name_fmt="any_{}",
    )
    _check(con, out, """
        SELECT bool_or(CASE WHEN s = 'x' THEN b END) AS any_x,
               bool_or(CASE WHEN s = 'y' THEN b END) AS any_y
        FROM t
    """, "pivot_any")


def test_pivot_longer_lca_and_ids(spark, con, tbl):
    """Melting an int-typed and float-typed pair unifies to float."""
    wide = tbl >> pdt.mutate(vi=tbl.v.fill_null(0.0).cast(pdt.Int64()))
    out = (
        wide
        >> pdt.select(wide.k, wide.v, C.vi)
        >> pdt.pivot_longer(["v", "vi"], names_to="which",
                            values_to="val")
    )
    _check(con, out, """
        SELECT k, 'v' AS which, v AS val FROM t
        UNION ALL
        SELECT k, 'vi', CAST(CAST(trunc(coalesce(v, 0.0)) AS BIGINT)
                             AS DOUBLE)
        FROM t
    """, "pivot_longer_lca")


def test_pivot_wider_single_shuffle(spark, tbl):
    out = (
        tbl
        >> pdt.group_by(tbl.k)
        >> pdt.pivot_wider(names_from=tbl.s, values_from=tbl.v,
                           values=["x", "y"])
    )
    plan = (out >> pdt.build_query())
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_pivot_longer_no_shuffle(spark, tbl):
    out = tbl >> pdt.pivot_longer(["v"], names_to="n", values_to="x")
    plan = (out >> pdt.build_query())
    assert "Exchange" not in plan.split("== Physical Plan ==")[-1], plan


def test_pivot_errors(spark, tbl):
    with pytest.raises(ValueError, match="agg must be one of"):
        tbl >> pdt.pivot_wider(names_from=tbl.s, values_from=tbl.v,
                               values=["x"], agg="median")
    with pytest.raises(ValueError, match="duplicate pivot column"):
        tbl >> pdt.pivot_wider(names_from=tbl.s, values_from=tbl.v,
                               values=["x", "y"], name_fmt="same")
    with pytest.raises(ValueError, match="at least one value"):
        tbl >> pdt.pivot_wider(names_from=tbl.s, values_from=tbl.v,
                               values=[])
    grouped = tbl >> pdt.group_by(tbl.k)
    with pytest.raises(ValueError, match="grouped"):
        grouped >> pdt.pivot_longer(["v"], names_to="n", values_to="x")
