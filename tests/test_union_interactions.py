"""Union-interaction differential tests vs DuckDB, modeled on reference
tests/test_backend_equivalence/test_union.py: hidden columns, chained
unions, distinct over wide rows, renames, and error cases.
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


def test_union_hidden_columns_dropped(spark, con, tbl):
    """A hidden column on either side must not appear in (or affect) the
    union result."""
    t3, t4 = tbl("df3"), tbl("df4")
    left = (
        t3
        >> pdt.mutate(h=t3.col1 * 10)
        >> pdt.select(t3.col1, t3.col2)
    )
    right = (
        t4
        >> pdt.mutate(h2=t4.col1 * 7)
        >> pdt.select(t4.col1, t4.col2)
    )
    out = left >> pdt.union(right)
    _check(con, out, """
        SELECT col1, col2 FROM df3
        UNION ALL
        SELECT col1, col2 FROM df4
    """, "union_hidden_dropped")


def test_union_chained(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    a = t3 >> pdt.select(t3.col1, t3.col2)
    b = t4 >> pdt.select(t4.col1, t4.col2)
    out = a >> pdt.union(b) >> pdt.union(a)
    _check(con, out, """
        SELECT col1, col2 FROM df3
        UNION ALL SELECT col1, col2 FROM df4
        UNION ALL SELECT col1, col2 FROM df3
    """, "union_chained")


def test_union_distinct_narrow(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    a = t3 >> pdt.select(t3.col2, t3.col3)
    b = t4 >> pdt.select(t4.col2, t4.col3)
    out = a >> pdt.union(b, distinct=True)
    _check(con, out, """
        SELECT col2, col3 FROM df3
        UNION
        SELECT col2, col3 FROM df4
    """, "union_distinct_narrow")


def test_union_after_filter_arrange(spark, con, tbl):
    """arrange before union is discarded (set semantics) but filters
    apply (reference test_union_after_operations)."""
    t3, t4 = tbl("df3"), tbl("df4")
    a = (
        t3
        >> pdt.filter(t3.col1 > 0)
        >> pdt.arrange(t3.col1)
        >> pdt.select(t3.col1, t3.col4)
    )
    b = (
        t4
        >> pdt.filter(t4.col1 > 0)
        >> pdt.arrange(t4.col1)
        >> pdt.select(t4.col1, t4.col4)
    )
    out = a >> pdt.union(b)
    _check(con, out, """
        SELECT col1, col4 FROM df3 WHERE col1 > 0
        UNION ALL
        SELECT col1, col4 FROM df4 WHERE col1 > 0
    """, "union_after_filter")


def test_union_with_rename(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    a = (
        t3
        >> pdt.select(t3.col1, t3.col4)
        >> pdt.rename({"col1": "k", "col4": "v"})
    )
    b = (
        t4
        >> pdt.select(t4.col1, t4.col4)
        >> pdt.rename({"col1": "k", "col4": "v"})
    )
    out = a >> pdt.union(b)
    _check(con, out, """
        SELECT col1 AS k, col4 AS v FROM df3
        UNION ALL
        SELECT col1 AS k, col4 AS v FROM df4
    """, "union_with_rename")


def test_union_then_window(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    a = t3 >> pdt.select(t3.col2, t3.col4)
    b = t4 >> pdt.select(t4.col2, t4.col4)
    u = a >> pdt.union(b)
    out = (
        u
        >> pdt.group_by(C.col2)
        >> pdt.mutate(s=C.col4.sum())
        >> pdt.ungroup()
    )
    _check(con, out, """
        SELECT col2, col4,
               CAST(sum(col4) OVER (PARTITION BY col2) AS BIGINT) AS s
        FROM (SELECT col2, col4 FROM df3
              UNION ALL SELECT col2, col4 FROM df4)
    """, "union_then_window")


def test_union_mismatched_columns_raises(spark, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    with pytest.raises((ValueError, TypeError)):
        (t3 >> pdt.select(t3.col1)) >> pdt.union(t4 >> pdt.select(t4.col2))


def test_union_grouped_raises(spark, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    with pytest.raises(ValueError):
        (t3 >> pdt.group_by(t3.col1)) >> pdt.union(t4)
    with pytest.raises(ValueError):
        t3 >> pdt.union(t4 >> pdt.group_by(t4.col1))
