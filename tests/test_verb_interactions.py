"""Verb-interaction differential tests vs DuckDB, modeled on the
reference's chained-verb backend-equivalence cases (reference
tests/test_backend_equivalence/test_join.py, test_summarize.py,
test_window_function.py): self-join chains, theta joins, joins after
summarize/window, mixed equi+theta `on` lists, arrange-after-mutate.

Each pipeline ends in an explicit projection with fixed output names so
the DuckDB SQL stays readable regardless of join-suffix rules (those
have their own tests in test_fixes.py).
"""

import duckdb
import pyarrow as pa
import pytest

import pydiverse_transform_spark as pdt

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


def test_self_join_chain(spark, con, tbl):
    t = tbl("df3")
    u = t >> pdt.alias("u")
    j1 = t >> pdt.left_join(u, on=t.col1 == u.col1)
    v = t >> pdt.alias("v")
    out = (
        j1
        >> pdt.inner_join(v, on=t.col4 == v.col4)
        >> pdt.mutate(k=t.col4, u3=u.col3, v5=v.col5)
        >> pdt.select("k", "u3", "v5")
    )
    _check(con, out, """
        SELECT a.col4 AS k, b.col3 AS u3, c.col5 AS v5
        FROM df3 a LEFT JOIN df3 b ON a.col1 = b.col1
        JOIN df3 c ON a.col4 = c.col4
    """, "self_join_chain")


def test_self_join_without_alias_raises(spark, tbl):
    t = tbl("df3")
    with pytest.raises(ValueError):
        t >> pdt.inner_join(t, on=t.col1 == t.col1)


def test_theta_join_aggregate(spark, con, tbl):
    t, s = tbl("df3"), tbl("df4")
    out = (
        t
        >> pdt.inner_join(s, on=t.col1 <= s.col1)
        >> pdt.summarize(
            n=pdt.count(),
            s1=t.col4.sum(),
            s2=s.col4.sum(),
        )
    )
    _check(con, out, """
        SELECT count(*) AS n, CAST(sum(a.col4) AS BIGINT) AS s1, CAST(sum(b.col4) AS BIGINT) AS s2
        FROM df3 a JOIN df4 b ON a.col1 <= b.col1
    """, "theta_join_aggregate")


def test_theta_join_expression_pred(spark, con, tbl):
    """Join condition mixing arithmetic, string fn, and CASE (reference
    test_join.py test_ineq_join third case)."""
    s, t = tbl("df3"), tbl("df_strings")
    cond = ((s.col1 - s.col2) <= t.c.str.len()) & (
        s.col4 >= pdt.when(t.col1.str.starts_with("-")).then(100).otherwise(4)
    )
    out = (
        s
        >> pdt.inner_join(t, on=cond)
        >> pdt.summarize(n=pdt.count(), k4=s.col4.sum())
    )
    _check(con, out, """
        SELECT count(*) AS n, CAST(sum(a.col4) AS BIGINT) AS k4
        FROM df3 a JOIN df_strings b
          ON (a.col1 - a.col2) <= length(b.c)
         AND a.col4 >= (CASE WHEN starts_with(b.col1, '-') THEN 100 ELSE 4 END)
    """, "theta_join_expression_pred")


def test_mixed_equi_theta_on_list(spark, con, tbl):
    """on=[\"col2\", expr] — string means equi on the shared name, the
    rest ANDed (reference test_join.py test_ineq_join last case)."""
    s, t = tbl("df3"), tbl("df4")
    out = (
        s
        >> pdt.inner_join(t, on=["col2", s.col3 <= t.col3])
        >> pdt.summarize(n=pdt.count(), a4=s.col4.sum(), b4=t.col4.sum())
    )
    _check(con, out, """
        SELECT count(*) AS n, CAST(sum(a.col4) AS BIGINT) AS a4, CAST(sum(b.col4) AS BIGINT) AS b4
        FROM df3 a JOIN df4 b ON a.col2 = b.col2 AND a.col3 <= b.col3
    """, "mixed_equi_theta_on_list")


def test_join_after_summarize(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    g = (
        t3
        >> pdt.group_by(t3.col2)
        >> pdt.summarize(j=t3.col4.sum())
        >> pdt.alias("g")
    )
    out = (
        t4
        >> pdt.left_join(g, on=t4.col2 == g.col2)
        >> pdt.mutate(c4=t4.col4, j2=g.j)
        >> pdt.select("c4", "j2")
    )
    _check(con, out, """
        SELECT b.col4 AS c4, g.j AS j2
        FROM df4 b LEFT JOIN (
            SELECT col2, CAST(sum(col4) AS BIGINT) AS j FROM df3 GROUP BY col2
        ) g ON b.col2 = g.col2
    """, "join_after_summarize")


def test_join_after_window(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    w = (
        t3
        >> pdt.mutate(y=pdt.dense_rank(arrange=t3.col4))
        >> pdt.alias("w")
    )
    out = (
        w
        >> pdt.inner_join(t4, on=w.y == t4.col1)
        >> pdt.mutate(y2=w.y, k=w.col4, c4=t4.col4)
        >> pdt.select("y2", "k", "c4")
    )
    _check(con, out, """
        SELECT w.y AS y2, w.col4 AS k, b.col4 AS c4
        FROM (
            SELECT col4, dense_rank() OVER (ORDER BY col4) AS y FROM df3
        ) w JOIN df4 b ON w.y = b.col1
    """, "join_after_window")


def test_summarize_then_window_downstream(spark, con, tbl):
    """Window over the result of a summarize (two grouping scopes)."""
    t3 = tbl("df3")
    g = t3 >> pdt.group_by(t3.col2) >> pdt.summarize(s=t3.col4.sum())
    out = (
        g
        >> pdt.mutate(r=pdt.row_number(arrange=[g.s.descending(),
                                                g.col2.ascending()]))
        >> pdt.select("col2", "s", "r")
    )
    _check(con, out, """
        SELECT col2, s, row_number() OVER (ORDER BY s DESC, col2 ASC) AS r
        FROM (SELECT col2, CAST(sum(col4) AS BIGINT) AS s FROM df3 GROUP BY col2)
    """, "summarize_then_window")


def test_arrange_after_mutate_window(spark, con, tbl):
    """Mutate a window column, then arrange by it plus a tiebreaker and
    slice — order interplay (reference test_arrange.py
    test_arrange_after_mutate)."""
    t4 = tbl("df4")
    out = (
        t4
        >> pdt.mutate(cs=t4.col4.sum(partition_by=t4.col2))
        >> pdt.arrange(pdt.C.cs.nulls_last(), t4.col4.nulls_last())
        >> pdt.slice_head(6)
        >> pdt.select("col4", "cs")
    )
    _check(con, out, """
        SELECT col4, cs FROM (
            SELECT col4, CAST(sum(col4) OVER (PARTITION BY col2) AS BIGINT) AS cs
            FROM df4
        ) ORDER BY cs NULLS LAST, col4 NULLS LAST LIMIT 6
    """, "arrange_after_mutate_window")


def test_union_of_join_and_filter(spark, con, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    a = (
        t3
        >> pdt.inner_join(t4, on=t3.col1 == t4.col1)
        >> pdt.mutate(k=t3.col4, v=t4.col4)
        >> pdt.select("k", "v")
    )
    b = (
        t3
        >> pdt.filter(t3.col2 == 1)
        >> pdt.mutate(k=t3.col4, v=t3.col3)
        >> pdt.select("k", "v")
    )
    out = a >> pdt.union(b) >> pdt.summarize(
        n=pdt.count(), ks=pdt.C.k.sum(), vs=pdt.C.v.sum()
    )
    _check(con, out, """
        WITH a AS (
            SELECT x.col4 AS k, y.col4 AS v
            FROM df3 x JOIN df4 y ON x.col1 = y.col1
        ), b AS (
            SELECT col4 AS k, col3 AS v FROM df3 WHERE col2 = 1
        )
        SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS ks, CAST(sum(v) AS BIGINT) AS vs
        FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    """, "union_of_join_and_filter")


def test_filter_on_window_via_mutate(spark, con, tbl):
    """filter may not contain window fns — the mutate-then-filter idiom
    must give the SQL QUALIFY result."""
    t3 = tbl("df3")
    out = (
        t3
        >> pdt.mutate(r=pdt.row_number(
            arrange=[t3.col4.descending()], partition_by=t3.col2))
        >> pdt.filter(pdt.C.r <= 2)
        >> pdt.select("col2", "col4", "r")
    )
    _check(con, out, """
        SELECT col2, col4, r FROM (
            SELECT col2, col4, row_number()
                OVER (PARTITION BY col2 ORDER BY col4 DESC) AS r
            FROM df3
        ) WHERE r <= 2
    """, "filter_on_window_via_mutate")


def test_window_fn_in_filter_raises(spark, tbl):
    t3 = tbl("df3")
    with pytest.raises((ValueError, TypeError)):
        t3 >> pdt.filter(
            pdt.row_number(arrange=t3.col4) <= 2
        )


def test_grouped_join_raises(spark, tbl):
    t3, t4 = tbl("df3"), tbl("df4")
    with pytest.raises(ValueError):
        (t3 >> pdt.group_by(t3.col2)) >> pdt.inner_join(
            t4, on=t3.col1 == t4.col1
        )
    with pytest.raises(ValueError):
        t3 >> pdt.inner_join(
            t4 >> pdt.group_by(t4.col2), on=t3.col1 == t4.col1
        )


def test_arrange_by_expression(spark, con, tbl):
    """arrange by a computed expression (reference test_arrange.py
    test_arrange_expression: arrange(-t.col4 * 2))."""
    t = tbl("df3")
    out = (
        t
        >> pdt.arrange(-t.col4 * 2)
        >> pdt.slice_head(6)
        >> pdt.select("col4")
    )
    _check(con, out, """
        SELECT col4 FROM df3 ORDER BY -col4 * 2 LIMIT 6
    """, "arrange_by_expression")


def test_group_by_const_and_window(spark, con, tbl):
    """Constant mutate column as group key and as partition key
    (reference test_group_by_scalar / test_partition_by_const_col)."""
    t = tbl("df3")
    out = (
        t
        >> pdt.mutate(x=pdt.lit(0))
        >> pdt.group_by(pdt.C.x)
        >> pdt.summarize(y=t.col1.sum())
    )
    _check(con, out, """
        SELECT 0 AS x, CAST(sum(col1) AS BIGINT) AS y FROM df3
    """, "group_by_const")

    out2 = (
        t
        >> pdt.mutate(x=pdt.lit(0))
        >> pdt.mutate(y=t.col3.sum(partition_by=pdt.C.x))
        >> pdt.select("col4", "y")
    )
    _check(con, out2, """
        SELECT col4, CAST(sum(col3) OVER () AS BIGINT) AS y FROM df3
    """, "partition_by_const")


def test_group_by_bool_window(spark, con, tbl):
    t = tbl("df4")
    out = (
        t
        >> pdt.mutate(x=t.col1 <= t.col2)
        >> pdt.group_by(pdt.C.x)
        >> pdt.mutate(y=pdt.C.col4.mean())
        >> pdt.ungroup()
        >> pdt.select("col4", "x", "y")
    )
    _check(con, out, """
        SELECT col4, col1 <= col2 AS x,
               avg(col4) OVER (PARTITION BY (col1 <= col2)) AS y
        FROM df4
    """, "group_by_bool_window")


def test_rollup_cube_errors(spark):
    import pytest as _pytest

    import pydiverse_transform_spark as pdt

    t = pdt.Table({"k": ["a", "a", "b"], "v": [1, 2, 3]}, "t")
    rows = t >> pdt.rollup(pdt.C.k, s=pdt.C.v.sum()) >> pdt.export(
        pdt.ListOfRows)
    got = sorted(((r["k"] or ""), r["s"]) for r in rows)
    assert got == [("", 6), ("a", 3), ("b", 3)]

    cube_rows = t >> pdt.cube(pdt.C.k, n=pdt.count()) >> pdt.export(
        pdt.ListOfRows)
    assert len(cube_rows) == 3  # a, b, total

    with _pytest.raises(ValueError, match="group_by"):
        t >> pdt.group_by(t.k) >> pdt.rollup(t.k, s=t.v.sum())
    with _pytest.raises(ValueError, match="grouping column"):
        t >> pdt.rollup(s=t.v.sum())
    with _pytest.raises(Exception, match="aggregat"):
        t >> pdt.rollup(t.k, s=t.v)


def test_rollup_output_composes_with_verbs(spark, sf_dir):
    """Rollup output is an ordinary table: filter out the grand total,
    join back to a dimension, arrange — all downstream verbs work."""
    import pydiverse_transform_spark as pdt
    from pydiverse_transform_spark import C

    n = pdt.read_parquet(spark, f"{sf_dir}/nation.parquet", name="nation")
    cu = pdt.read_parquet(spark, f"{sf_dir}/customer.parquet",
                          name="customer")
    rolled = (
        cu
        >> pdt.rollup(C.c_nationkey, grouping_id="gid",
                      total=cu.c_acctbal.sum().round(6),
                      n_cust=pdt.count())
    )
    out = (
        rolled
        >> pdt.filter(C.gid == 0)  # keep only the per-nation rows
        >> pdt.inner_join(n, on=rolled.c_nationkey == n.n_nationkey)
        >> pdt.select(n.n_name, C.total, C.n_cust)
        >> pdt.arrange(C.n_name)
        >> pdt.export(pdt.ListOfRows)
    )
    # must equal a plain group_by+summarize of the same data
    plain = (
        pdt.read_parquet(spark, f"{sf_dir}/customer.parquet", name="c2")
        >> pdt.group_by(C.c_nationkey)
        >> pdt.summarize(total=C.c_acctbal.sum().round(6),
                         n_cust=pdt.count())
    )
    expected = (
        plain
        >> pdt.inner_join(n, on=plain.c_nationkey == n.n_nationkey)
        >> pdt.select(n.n_name, C.total, C.n_cust)
        >> pdt.arrange(C.n_name)
        >> pdt.export(pdt.ListOfRows)
    )
    assert out == expected and len(out) > 0


def test_semi_anti_join_theta(spark, con, tbl):
    """semi/anti with a theta condition; anti must keep NULL-key rows
    (NULL = anything is unknown, never a match)."""
    t1 = tbl("df1")
    t2 = tbl("df2")
    semi = (
        t1
        >> pdt.semi_join(t2, on=[t1.col1 == t2.col1, t2.col3 > 1.0])
        >> pdt.select(t1.col1, t1.col2)
    )
    _check(con, semi, """
        SELECT a.col1, a.col2 FROM df1 a
        WHERE EXISTS (SELECT 1 FROM df2 b
                      WHERE a.col1 = b.col1 AND b.col3 > 1.0)
    """, "semi_theta")
    anti = (
        t1
        >> pdt.anti_join(t2, on=[t1.col1 == t2.col1, t2.col3 > 1.0])
        >> pdt.select(t1.col1, t1.col2)
    )
    _check(con, anti, """
        SELECT a.col1, a.col2 FROM df1 a
        WHERE NOT EXISTS (SELECT 1 FROM df2 b
                          WHERE a.col1 = b.col1 AND b.col3 > 1.0)
    """, "anti_theta")


def test_semi_join_preserves_order_for_window(spark, con, tbl):
    """A filtering join is a row filter: the left order survives, so a
    following window op needs no re-arrange."""
    t1 = tbl("df1")
    t2 = tbl("df2")
    out = (
        t1
        >> pdt.arrange(t1.col1)
        >> pdt.semi_join(t2, on=t1.col1 == t2.col1)
        >> pdt.mutate(prev=t1.col2.shift(1))
        >> pdt.select(t1.col1, t1.col2, pdt.C.prev)
    )
    _check(con, out, """
        SELECT col1, col2,
               lag(col2) OVER (ORDER BY col1) AS prev
        FROM df1 a
        WHERE EXISTS (SELECT 1 FROM df2 b WHERE a.col1 = b.col1)
    """, "semi_order")


def test_unnest_keep_empty(spark):
    df = pdt.from_dict(spark, {
        "id": [1, 2, 3],
        "xs": [[10, 20], [], None],
    }, name="u")
    dropped = [(r["id"], r["xs"]) for r in
               (df >> pdt.unnest(df.xs) >> pdt.export(pdt.ListOfRows))]
    assert sorted(dropped) == [(1, 10), (1, 20)]
    kept = [(r["id"], r["xs"]) for r in
            (df >> pdt.unnest(df.xs, keep_empty=True)
                >> pdt.export(pdt.ListOfRows))]
    assert sorted(kept, key=lambda r: (r[0], r[1] is None, r[1] or 0)) == \
        [(1, 10), (1, 20), (2, None), (3, None)]


def test_unnest_type_error(spark, tbl):
    t1 = tbl("df1")
    with pytest.raises(TypeError, match="list column"):
        t1 >> pdt.unnest(t1.col1)
