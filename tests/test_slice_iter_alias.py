"""Table iteration, alias(keep_col_refs=), and slice_head interplay —
modeled on reference test_slice_head.py and the `for col in t` idiom
used across the reference test suite.
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


def test_table_iteration(spark, tbl):
    t = tbl("df3")
    cols = list(t)
    assert [c.name for c in cols] == t.columns
    # the dict-comprehension mutate idiom from reference test_cast.py
    out = (
        t
        >> pdt.select(t.col1, t.col2)
        >> (lambda s: s >> pdt.mutate(
            **{f"{c.name}_s": c.cast(pdt.String()) for c in s}))
        >> pdt.export(pdt.Pandas)
    )
    assert set(out.columns) == {"col1", "col2", "col1_s", "col2_s"}


def test_arrange_all_cols_slice_offsets(spark, con, tbl):
    t = tbl("df3")
    for n, off in [(1, 0), (10, 0), (100, 0), (1, 8), (10, 8), (100, 8),
                   (10, 100)]:
        out = (
            t
            >> pdt.arrange(*[c.ascending() for c in t][:-1])
            >> pdt.slice_head(n, offset=off)
            >> pdt.select(t.col4)
        )
        _check(con, out, f"""
            SELECT col4 FROM df3
            ORDER BY col1, col2, col3, col4, col5, col6
            LIMIT {n} OFFSET {off}
        """, f"slice_{n}_{off}")


def test_slice_then_alias_keep_refs_join(spark, con, tbl):
    """slice_head + alias(keep_col_refs=True) + join using the ORIGINAL
    table's column refs (reference test_slice_head.py:67)."""
    t, u = tbl("df3"), tbl("df4")
    out = (
        t
        >> pdt.arrange(*[c.ascending() for c in t])
        >> pdt.slice_head(3)
        >> pdt.alias("s", keep_col_refs=True)
        >> pdt.left_join(u, on=t.col1 == u.col1)
        >> pdt.mutate(k=t.col4, v=u.col4)
        >> pdt.select("k", "v")
    )
    _check(con, out, """
        SELECT s.col4 AS k, u.col4 AS v
        FROM (
            SELECT * FROM df3
            ORDER BY col1, col2, col3, col4, col5, col6, col7
            LIMIT 3
        ) s LEFT JOIN df4 u ON s.col1 = u.col1
    """, "slice_alias_join")


def test_slice_on_join_right_side(spark, con, tbl):
    t, u = tbl("df3"), tbl("df4")
    sliced = (
        u
        >> pdt.arrange(*[c.ascending() for c in u][:4])
        >> pdt.slice_head(2, offset=1)
        >> pdt.alias("su")
    )
    out = (
        t
        >> pdt.left_join(sliced, on=t.col1 == sliced.col1)
        >> pdt.mutate(k=t.col4, v=sliced.col4)
        >> pdt.select("k", "v")
    )
    _check(con, out, """
        SELECT t.col4 AS k, su.col4 AS v
        FROM df3 t LEFT JOIN (
            SELECT * FROM df4
            ORDER BY col1 NULLS FIRST, col2 NULLS FIRST, col3 NULLS FIRST,
                     col4 NULLS FIRST
            LIMIT 2 OFFSET 1
        ) su ON t.col1 = su.col1
    """, "slice_right_side_join")


def test_filter_before_and_after_slice(spark, con, tbl):
    t = tbl("df3")
    out1 = (
        t
        >> pdt.filter(t.col4 % 2 == 0)
        >> pdt.arrange(*[c.ascending() for c in t][:-1])
        >> pdt.slice_head(4, offset=2)
        >> pdt.select(t.col4)
    )
    _check(con, out1, """
        SELECT col4 FROM df3 WHERE col4 % 2 = 0
        ORDER BY col1, col2, col3, col4, col5, col6
        LIMIT 4 OFFSET 2
    """, "filter_before_slice")

    out2 = (
        t
        >> pdt.arrange(*[c.ascending() for c in t][:-1])
        >> pdt.slice_head(4, offset=2)
        >> pdt.alias("s")
        >> pdt.filter(C.col1 == 1)
        >> pdt.select("col4")
    )
    _check(con, out2, """
        SELECT col4 FROM (
            SELECT * FROM df3
            ORDER BY col1, col2, col3, col4, col5, col6
            LIMIT 4 OFFSET 2
        ) WHERE col1 = 1
    """, "filter_after_slice")


def test_slice_on_grouped_raises(spark, tbl):
    t = tbl("df3")
    with pytest.raises(ValueError):
        (t >> pdt.group_by(t.col1)) >> pdt.slice_head(3)
