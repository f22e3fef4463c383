"""Window-function interaction differential tests vs DuckDB, modeled on
reference tests/test_backend_equivalence/test_window_function.py:
chained grouped mutates, window-over-window via alias, filter= kwarg,
window before/after summarize, and boolean shift chains.
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


def test_chained_grouped_mutates(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.group_by(t.col1)
        >> pdt.mutate(mn=t.col4.min(), mx=t.col4.max())
        >> pdt.mutate(span=C.mx - C.mn)
        >> pdt.ungroup()
        >> pdt.select("col4", "mn", "mx", "span")
    )
    _check(con, out, """
        SELECT col4,
               min(col4) OVER (PARTITION BY col1) AS mn,
               max(col4) OVER (PARTITION BY col1) AS mx,
               max(col4) OVER (PARTITION BY col1)
                 - min(col4) OVER (PARTITION BY col1) AS span
        FROM df3
    """, "chained_grouped_mutates")


def test_window_over_window_via_alias(spark, con, tbl):
    """Grouped max, ungroup, alias, then a global mean over the result
    (reference test_nested first case)."""
    t = tbl("df3")
    step = (
        t
        >> pdt.group_by(t.col1)
        >> pdt.mutate(rng=t.col4.max() - 10)
        >> pdt.ungroup()
        >> pdt.alias("s")
    )
    out = (
        step
        >> pdt.mutate(rng_mean=step.rng.mean())
        >> pdt.select("col4", "rng", "rng_mean")
    )
    _check(con, out, """
        SELECT col4, rng, avg(rng) OVER () AS rng_mean
        FROM (
            SELECT col4, max(col4) OVER (PARTITION BY col1) - 10 AS rng
            FROM df3
        )
    """, "window_over_window")


def test_grouped_window_then_filter(spark, con, tbl):
    t = tbl("df3")
    step = (
        t
        >> pdt.group_by(t.col1, t.col2)
        >> pdt.mutate(mean3=t.col3.mean())
        >> pdt.ungroup()
        >> pdt.alias("s")
    )
    out = (
        step
        >> pdt.filter(step.mean3 <= 2.0)
        >> pdt.select("col3", "mean3")
    )
    _check(con, out, """
        SELECT col3, mean3 FROM (
            SELECT col3, avg(col3) OVER (PARTITION BY col1, col2) AS mean3
            FROM df3
        ) WHERE mean3 <= 2.0
    """, "grouped_window_then_filter")


def test_agg_filter_kwarg(spark, con, tbl):
    """filter= on aggregates (reference test_filter_argument)."""
    t = tbl("df4")
    out = (
        t
        >> pdt.mutate(
            u=t.col2.mean(filter=~t.col2.is_null()),
            v=t.col2.mean(filter=~((t.col4 % 3) == 0)),
            w=t.col1.min(filter=~t.col1.is_null(), partition_by=t.col3),
            z=t.col3.min(filter=t.col3.is_null()),
        )
        >> pdt.select("col4", "u", "v", "w", "z")
    )
    _check(con, out, """
        SELECT col4,
               avg(col2) FILTER (WHERE col2 IS NOT NULL) OVER () AS u,
               avg(col2) FILTER (WHERE NOT (col4 % 3 = 0)) OVER () AS v,
               min(col1) FILTER (WHERE col1 IS NOT NULL)
                   OVER (PARTITION BY col3) AS w,
               min(col3) FILTER (WHERE col3 IS NULL) OVER () AS z
        FROM df4
    """, "agg_filter_kwarg")


def test_window_before_summarize(spark, con, tbl):
    """Grouped window + row_number, filter on both, then summarize over
    the survivors (reference test_complex first case)."""
    t = tbl("df3")
    step = (
        t
        >> pdt.group_by(t.col1, t.col2)
        >> pdt.mutate(
            mean3=t.col3.mean(),
            rn=pdt.row_number(arrange=[t.col1.ascending(),
                                       t.col2.ascending(),
                                       t.col4.ascending()]),
        )
        >> pdt.ungroup()
        >> pdt.alias("s")
    )
    out = (
        step
        >> pdt.filter(step.mean3 > step.rn)
        >> pdt.group_by(step.col1)
        >> pdt.summarize(meta_mean=step.mean3.mean())
        >> pdt.arrange(C.meta_mean, C.col1)
    )
    _check(con, out, """
        SELECT col1, avg(mean3) AS meta_mean FROM (
            SELECT col1, col2, col4,
                   avg(col3) OVER (PARTITION BY col1, col2) AS mean3,
                   row_number() OVER (PARTITION BY col1, col2
                                      ORDER BY col1, col2, col4) AS rn
            FROM df3
        ) WHERE mean3 > rn
        GROUP BY col1
        ORDER BY meta_mean, col1
    """, "window_before_summarize")


def test_window_after_summarize_regrouped(spark, con, tbl):
    """summarize, re-group on an aggregated column, window over that
    grouping (reference test_complex third case)."""
    t = tbl("df3")
    g = (
        t
        >> pdt.group_by(t.col1, t.col2)
        >> pdt.summarize(mean3=t.col3.mean(), u=t.col4.max())
        >> pdt.group_by(C.u)
        >> pdt.alias("g")
    )
    out = (
        g
        >> pdt.mutate(minm=g.mean3.min(), maxm=g.mean3.max())
        >> pdt.mutate(span=C.maxm - C.minm)
        >> pdt.ungroup()
        >> pdt.filter(C.span < 3)
        >> pdt.select("u", "mean3", "span")
    )
    _check(con, out, """
        SELECT u, mean3, span FROM (
            SELECT u, mean3,
                   max(mean3) OVER (PARTITION BY u)
                     - min(mean3) OVER (PARTITION BY u) AS span
            FROM (
                SELECT avg(col3) AS mean3, max(col4) AS u
                FROM df3 GROUP BY col1, col2
            )
        ) WHERE span < 3
    """, "window_after_summarize_regrouped")


def test_bool_shift_chain(spark, con, tbl):
    """Shift booleans both directions with different null placements,
    then AND them (reference test_nested_bool)."""
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col1)
        >> pdt.mutate(x=t.col1 <= t.col2, y=(t.col3 * 4) >= t.col4)
        >> pdt.mutate(
            xs=C.x.shift(1, arrange=[t.col4.nulls_last()]),
            ys=C.y.shift(-1, arrange=[t.col4.nulls_first()]),
        )
        >> pdt.mutate(both=C.xs & C.ys)
        >> pdt.ungroup()
        >> pdt.select("col4", "x", "y", "xs", "ys", "both")
    )
    _check(con, out, """
        SELECT col4, x, y, xs, ys, xs AND ys AS both FROM (
            SELECT col4, x, y,
                   lag(x, 1) OVER (PARTITION BY col1
                                   ORDER BY col4 NULLS LAST) AS xs,
                   lead(y, 1) OVER (PARTITION BY col1
                                    ORDER BY col4 NULLS FIRST) AS ys
            FROM (
                SELECT col1, col4, col1 <= col2 AS x, (col3 * 4) >= col4 AS y
                FROM df4
            )
        )
    """, "bool_shift_chain")


def test_cum_sum_grouped_with_nulls(spark, con, tbl):
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col2)
        >> pdt.mutate(cs=t.col4.cum_sum(arrange=[t.col4.nulls_first()]))
        >> pdt.ungroup()
        >> pdt.select("col2", "col4", "cs")
    )
    _check(con, out, """
        SELECT col2, col4,
               sum(col4) OVER (PARTITION BY col2 ORDER BY col4 NULLS FIRST
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cs
        FROM df4
    """, "cum_sum_grouped_nulls")


def test_rank_vs_dense_rank_ties(spark, con, tbl):
    t = tbl("df3")
    out = (
        t
        >> pdt.mutate(
            r=pdt.rank(arrange=[t.col2.ascending(), ]),
            d=pdt.dense_rank(arrange=[t.col2.ascending()]),
            rn=pdt.row_number(arrange=[t.col2.ascending(),
                                       t.col4.ascending()]),
        )
        >> pdt.select("col2", "col4", "r", "d", "rn")
    )
    _check(con, out, """
        SELECT col2, col4,
               rank() OVER (ORDER BY col2) AS r,
               dense_rank() OVER (ORDER BY col2) AS d,
               row_number() OVER (ORDER BY col2, col4) AS rn
        FROM df3
    """, "rank_vs_dense_rank")


def test_n_distinct_in_mutate_window(spark, con, tbl):
    """n_distinct in mutate promotes to size(collect_set) over the
    ambient window — count(DISTINCT) OVER is unsupported in Spark, and
    collect_set drops nulls exactly like count_distinct."""
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.mutate(
            nd=t.col1.n_distinct(),
            nd_filt=t.col1.n_distinct(filter=(t.col4 % 2) == 0),
        )
        >> pdt.ungroup()
        >> pdt.select("col4", "nd", "nd_filt")
    )
    _check(con, out, """
        SELECT col4,
               count(DISTINCT col1) OVER (PARTITION BY col3) AS nd,
               count(DISTINCT CASE WHEN col4 % 2 = 0 THEN col1 END)
                   OVER (PARTITION BY col3) AS nd_filt
        FROM df4
    """, "n_distinct_window")


def test_arg_minmax_window_and_agg(spark, con, tbl):
    """arg_min/arg_max in summarize and as a window over the ambient
    grouping; rid-unique by-keys so ties cannot occur."""
    t = tbl("df4")
    agg = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.summarize(
            lo=t.col2.arg_min(t.col4),
            hi=t.col2.arg_max(t.col4),
        )
    )
    _check(con, agg, """
        SELECT col3, arg_min(col2, col4) AS lo, arg_max(col2, col4) AS hi
        FROM df4 GROUP BY col3
    """, "arg_minmax_agg")
    win = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.mutate(w=t.col2.arg_max(t.col4))
        >> pdt.ungroup()
        >> pdt.select("col4", "w")
    )
    _check(con, win, """
        SELECT col4, arg_max(col2, col4) OVER (PARTITION BY col3) AS w
        FROM df4
    """, "arg_minmax_window")


def test_percent_rank_ntile(spark, con, tbl):
    """percent_rank 0 for single-row partitions; ntile split matches
    DuckDB when the order is total (rid tie-break)."""
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.mutate(
            pr=pdt.percent_rank(arrange=[t.col4]),
            tile=pdt.ntile(3, arrange=[t.col4]),
        )
        >> pdt.ungroup()
        >> pdt.select("col4", "pr", "tile")
    )
    _check(con, out, """
        SELECT col4,
               percent_rank() OVER w AS pr,
               ntile(3) OVER w AS tile
        FROM df4
        WINDOW w AS (PARTITION BY col3 ORDER BY col4 NULLS FIRST)
    """, "percent_rank_ntile")


def test_cum_extrema(spark, con, tbl):
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.mutate(
            cmx=t.col1.cum_max(arrange=[t.col4]),
            cmn=t.col1.cum_min(arrange=[t.col4]),
        )
        >> pdt.ungroup()
        >> pdt.select("col4", "cmx", "cmn")
    )
    _check(con, out, """
        SELECT col4, max(col1) OVER w AS cmx, min(col1) OVER w AS cmn
        FROM df4
        WINDOW w AS (PARTITION BY col3 ORDER BY col4 NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """, "cum_extrema")


def test_first_last_ordered(spark, con, tbl):
    """Ordered first/last keep null VALUES (struct-wrapped collect) and
    work as windows over the ambient grouping; bare first() raises."""
    t = tbl("df4")
    agg = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.summarize(
            f=t.col2.first(arrange=[t.col4.nulls_first()]),
            l=t.col2.last(arrange=[t.col4.nulls_first()]),
        )
    )
    _check(con, agg, """
        SELECT col3,
               first(col2 ORDER BY col4 NULLS FIRST) AS f,
               last(col2 ORDER BY col4 NULLS FIRST) AS l
        FROM df4 GROUP BY col3
    """, "first_last_agg")
    win = (
        t
        >> pdt.group_by(t.col3)
        >> pdt.mutate(f=t.col2.first(arrange=[t.col4.nulls_first()]))
        >> pdt.ungroup()
        >> pdt.select("col4", "f")
    )
    _check(con, win, """
        SELECT a.col4, b.f FROM df4 a JOIN (
            SELECT col3, first(col2 ORDER BY col4 NULLS FIRST) AS f
            FROM df4 GROUP BY col3
        ) b ON a.col3 IS NOT DISTINCT FROM b.col3
    """, "first_last_window")
    with pytest.raises(ValueError, match="requires `arrange="):
        t >> pdt.summarize(f=t.col2.first()) >> pdt.export(pdt.Spark)
