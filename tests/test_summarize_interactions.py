"""Summarize-interaction differential tests vs DuckDB, modeled on
reference tests/test_backend_equivalence/test_summarize.py: chained
summarize, computed group keys, filter= in grouped aggs, group-cols in
agg expressions, and error cases (nested aggs, bare columns).
"""

import duckdb
import pyarrow as pa
import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C

from fixtures import ALL
from oracle_util import compare


@pytest.fixture(scope="session")
def con():
    con = duckdb.connect()
    for name, data in ALL.items():
        con.register(name, pa.table(data))
    return con


@pytest.fixture()
def tbl(spark):
    def make(name):
        return pdt.from_dict(spark, ALL[name], name=name)

    return make


def _check(con, table, sql, name):
    ok, msg = compare(table >> pdt.export(pdt.Spark), con, sql, name)
    assert ok, msg


def test_chained_summarize(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.group_by(t.col1, t.col2)
        >> pdt.summarize(mean3=t.col3.mean())
        >> pdt.alias("g")
        >> pdt.summarize(mm=C.mean3.mean())
    )
    _check(con, out, """
        SELECT avg(mean3) AS mm FROM (
            SELECT avg(col3) AS mean3 FROM df3 GROUP BY col1, col2
        )
    """, "chained_summarize")


def test_computed_group_key(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.mutate(k=(t.col1 + t.col2) * t.col4)
        >> pdt.group_by(C.k)
        >> pdt.summarize(x=t.col4.mean())
        >> pdt.arrange(C.k)
    )
    _check(con, out, """
        SELECT k, avg(col4) AS x FROM (
            SELECT col4, (col1 + col2) * col4 AS k FROM df3
        ) GROUP BY k ORDER BY k
    """, "computed_group_key")


def test_summarize_name_drop_then_mutate(spark, con, tbl):
    """After a global summarize the old columns are gone; their names
    are free for re-use (reference test_summarize_name_drop)."""
    t = tbl("df3")
    out = (
        t
        >> pdt.summarize(x=t.col1.count())
        >> pdt.mutate(col1=pdt.lit(1), col2=pdt.lit(2))
    )
    _check(con, out, """
        SELECT count(col1) AS x, 1 AS col1, 2 AS col2 FROM df3
    """, "summarize_name_drop")


def test_nested_agg_rejected(spark, tbl):
    t = tbl("df3")
    with pytest.raises((ValueError, TypeError)):
        t >> pdt.group_by(t.col1) >> pdt.summarize(m=t.col3.mean().mean())


def test_bare_column_rejected(spark, tbl):
    t = tbl("df4")
    with pytest.raises((ValueError, TypeError)):
        t >> pdt.summarize(x=t.col1)


def test_summarize_filter_kwarg(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.group_by(t.col2)
        >> pdt.summarize(u=t.col4.sum(filter=t.col1 != 0))
        >> pdt.arrange(C.col2)
    )
    _check(con, out, """
        SELECT col2, CAST(sum(col4) FILTER (WHERE col1 != 0) AS BIGINT) AS u
        FROM df3 GROUP BY col2 ORDER BY col2
    """, "summarize_filter_kwarg")


def test_summarize_filter_kwarg_expression(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.group_by(t.col4, t.col1)
        >> pdt.summarize(
            u=(t.col3 * t.col4 - t.col2).sum(
                filter=t.col5.is_in(pdt.lit("a"), pdt.lit("e"), pdt.lit("i"),
                                    pdt.lit("o"), pdt.lit("u"))
            )
        )
        >> pdt.arrange(C.col4, C.col1)
    )
    _check(con, out, """
        SELECT col4, col1,
               CAST(sum(col3 * col4 - col2)
                    FILTER (WHERE col5 IN ('a','e','i','o','u'))
                    AS BIGINT) AS u
        FROM df3 GROUP BY col4, col1 ORDER BY col4, col1
    """, "summarize_filter_expression")


def test_group_cols_in_agg_expression(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.group_by(t.col1, t.col2)
        >> pdt.summarize(u=t.col1 + t.col2)
        >> pdt.arrange(C.col1, C.col2)
    )
    _check(con, out, """
        SELECT col1, col2, col1 + col2 AS u
        FROM df3 GROUP BY col1, col2 ORDER BY col1, col2
    """, "group_cols_in_agg")


def test_nongroup_col_in_agg_rejected(spark, tbl):
    t = tbl("df3")
    with pytest.raises((ValueError, TypeError)):
        t >> pdt.group_by(t.col1, t.col2) >> pdt.summarize(u=t.col1 + t.col3)


def test_any_all_with_nulls(spark, con, tbl):
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col1)
        >> pdt.summarize(
            a=(t.col2 != t.col3).any(),
            l=(t.col2 != t.col3).all(),
        )
        >> pdt.arrange(C.col1.nulls_last())
    )
    _check(con, out, """
        SELECT col1, bool_or(col2 != col3) AS a, bool_and(col2 != col3) AS l
        FROM df4 GROUP BY col1 ORDER BY col1 NULLS LAST
    """, "any_all_nulls")


def test_mean_int_is_float(spark, con, tbl):
    t = tbl("df_int")
    out = t >> pdt.summarize(m=t.b.mean(), n=t.null_s.mean())
    df = out >> pdt.export(pdt.Pandas)
    assert str(df["m"].dtype) == "float64"
    _check(con, out, """
        SELECT avg(b) AS m, avg(null_s) AS n FROM df_int
    """, "mean_int_float")
