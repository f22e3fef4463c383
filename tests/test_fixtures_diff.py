"""Differential tests: the same pipeline through the pdt DSL on Spark vs
hand-written DuckDB SQL over identical fixture data (the reference's
backend-equivalence strategy, SURVEY §5, with DuckDB as the oracle).
"""

import duckdb
import pyarrow as pa
import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C

from fixtures import ALL
from oracle_util import compare

# every differential test runs under BOTH spark.sql.ansi.enabled settings
# (tests/conftest.py ansi_mode) — the null-on-edge oracle contract must be
# cluster-config independent
pytestmark = pytest.mark.usefixtures("ansi_both")


@pytest.fixture(scope="session")
def con():
    con = duckdb.connect()
    for name, data in ALL.items():
        con.register(name, pa.table(data))
    return con


def _check(spark, con, name, table, sql):
    df = table >> pdt.export(pdt.Spark)
    ok, msg = compare(df, con, sql, name)
    assert ok, msg


@pytest.fixture()
def tbl(spark):
    def make(name):
        return pdt.from_dict(spark, ALL[name], name=name)

    return make


def test_arith_nulls(spark, con, tbl):
    # division by zero: Spark ANSI raises; keep the divisor nonzero
    t = tbl("df2")
    out = (
        t
        >> pdt.filter(t.col3 != 0.0)
        >> pdt.mutate(
            s=t.col1 + t.col2,
            d=t.col1 - t.col2,
            m=(t.col3 * t.col2).round(6),
            q=(t.col1 / t.col3).round(6),
            p=(t.col3 ** 2).round(6),
            n=-t.col2,
            ab=t.col3.abs(),
        )
        >> pdt.select(t.col1, C.s, C.d, C.m, C.q, C.p, C.n, C.ab)
    )
    _check(spark, con, "arith_nulls", out, """
        SELECT col1, col1 + col2 AS s, col1 - col2 AS d,
               round(col3 * col2, 6) AS m, round(col1 / col3, 6) AS q,
               round(pow(col3, 2), 6) AS p, -col2 AS n, abs(col3) AS ab
        FROM df2 WHERE col3 != 0.0
    """)


def test_intdiv_c_semantics(spark, con, tbl):
    """floordiv/mod round toward zero / sign of dividend on negatives
    (reference ops/ops/arithmetic.py:52-127); DuckDB // and % match."""
    t = tbl("df_int")
    out = t >> pdt.mutate(
        fd=t.a // 3,
        md=t.a % 3,
        fdn=t.neg // 4,
        mdn=t.neg % 4,
        fdb=t.b // -3,
        mdb=t.b % -3,
    ) >> pdt.select(t.a, C.fd, C.md, C.fdn, C.mdn, C.fdb, C.mdb)
    _check(spark, con, "intdiv", out, """
        SELECT a, a // 3 AS fd, a % 3 AS md,
               neg // 4 AS fdn, neg % 4 AS mdn,
               b // -3 AS fdb, b % -3 AS mdb
        FROM df_int
    """)


def test_bool_kleene(spark, con, tbl):
    t = tbl("df_bool")
    out = t >> pdt.mutate(
        a_and_b=t.a & t.b,
        a_or_b=t.a | t.b,
        a_xor_b=t.a ^ t.b,
        not_a=~t.a,
    )
    _check(spark, con, "kleene", out, """
        SELECT a, b, a AND b AS a_and_b, a OR b AS a_or_b,
               a <> b AS a_xor_b, NOT a AS not_a
        FROM df_bool
    """)


def test_bool_aggregates(spark, con, tbl):
    t = tbl("df_bool")
    out = t >> pdt.summarize(
        any_a=t.a.any(),
        all_a=t.a.all(),
        sum_a=t.a.sum(),
        n_a=t.a.count(),
        n=pdt.count(),
    )
    _check(spark, con, "bool_agg", out, """
        SELECT bool_or(a) AS any_a, bool_and(a) AS all_a,
               CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS sum_a,
               count(a) AS n_a, count(*) AS n
        FROM df_bool
    """)


def test_empty_group_aggregates_null(spark, con, tbl):
    """sum/min/max over an all-null (or empty) group yields null, not 0
    (reference backend/polars.py:172-181; Spark native)."""
    t = tbl("df_num")
    out = t >> pdt.summarize(
        s=t.null_s.sum(filter=t.null_s > 100.0),
        mn=t.null_s.min(filter=t.null_s > 100.0),
        av=t.null_s.mean(filter=t.null_s > 100.0),
        n=t.null_s.count(),
    )
    _check(spark, con, "empty_group", out, """
        SELECT sum(null_s) FILTER (WHERE null_s > 100.0) AS s,
               min(null_s) FILTER (WHERE null_s > 100.0) AS mn,
               avg(null_s) FILTER (WHERE null_s > 100.0) AS av,
               count(null_s) AS n
        FROM df_num
    """)


def test_extreme_floats(spark, con, tbl):
    t = tbl("df_num")
    out = t >> pdt.mutate(
        lg=t.pos.log10().round(6),
        sq=t.pos.sqrt().round(6),
        mx=pdt.max(t.a, t.neg, t.zero),
        mn=pdt.min(t.a, t.neg, t.zero),
        fz=t.a.fill_null(pdt.lit(-1.0)),
    ) >> pdt.select(t.pos, C.lg, C.sq, C.mx, C.mn, C.fz)
    _check(spark, con, "extreme_floats", out, """
        SELECT pos, round(log10(pos), 6) AS lg, round(sqrt(pos), 6) AS sq,
               greatest(a, neg, zero) AS mx, least(a, neg, zero) AS mn,
               coalesce(a, -1.0) AS fz
        FROM df_num
    """)


def test_string_metachars(spark, con, tbl):
    """Regex metacharacters stay literal in non-regex ops."""
    t = tbl("df_strings")
    out = t >> pdt.mutate(
        ln=t.col1.str.len(),
        up=t.col1.str.upper(),
        lo=t.col1.str.lower(),
        st=t.col1.str.strip(),
        rep=t.col2.str.replace_all(".", "!"),
        sw=t.col2.str.starts_with(pdt.lit("a")),
        ew=t.col2.str.ends_with(pdt.lit("+")),
        ct=t.col2.str.contains("_", allow_regex=False),
        sl=t.col1.str.slice(pdt.lit(1), pdt.lit(3)),
    ) >> pdt.select(t.col1, t.col2, C.ln, C.up, C.lo, C.st, C.rep, C.sw,
                    C.ew, C.ct, C.sl)
    _check(spark, con, "string_metachars", out, """
        SELECT col1, col2, length(col1) AS ln, upper(col1) AS up,
               lower(col1) AS lo,
               regexp_replace(col1, '^\\s+|\\s+$', '', 'g') AS st,
               replace(col2, '.', '!') AS rep,
               col2 LIKE 'a%' AS sw,
               CASE WHEN col2 IS NULL THEN NULL
                    ELSE col2 LIKE '%+' END AS ew,
               contains(col2, '_') AS ct,
               substr(col1, 2, 3) AS sl
        FROM df_strings
    """)


def test_string_casts(spark, con, tbl):
    """String→number casts trim whitespace; strict=False nulls bad input
    (reference tree/col_expr.py:2686-2768)."""
    t = tbl("df_strings")
    out = t >> pdt.mutate(
        f=t.c.cast(pdt.Float64(), strict=False),
        i=t.d.cast(pdt.Int64(), strict=False),
    ) >> pdt.select(t.c, t.d, C.f, C.i)
    _check(spark, con, "string_casts", out, """
        SELECT c, d, TRY_CAST(c AS DOUBLE) AS f, TRY_CAST(d AS BIGINT) AS i
        FROM df_strings
    """)


def test_datetime_compare_extract(spark, con, tbl):
    t = tbl("df_datetime")
    out = t >> pdt.mutate(
        lt=t.col1 < t.col2,
        eq=t.col1 == t.col2,
        y=t.col1.dt.year(),
        mo=t.col1.dt.month(),
        dd=t.col1.dt.day(),
        hh=t.col1.dt.hour(),
        mi=t.col1.dt.minute(),
        ss=t.col1.dt.second(),
        ms=t.col1.dt.millisecond(),
        us=t.col1.dt.microsecond(),
        dow=t.col1.dt.day_of_week(),
        doy=t.col1.dt.day_of_year(),
        dy=t.cdate.dt.year(),
    ) >> pdt.select(C.lt, C.eq, C.y, C.mo, C.dd, C.hh, C.mi, C.ss, C.ms,
                    C.us, C.dow, C.doy, C.dy)
    _check(spark, con, "datetime_ops", out, """
        SELECT col1 < col2 AS lt, col1 = col2 AS eq,
               year(col1) AS y, month(col1) AS mo, day(col1) AS dd,
               hour(col1) AS hh, minute(col1) AS mi,
               CAST(date_part('second', col1) AS BIGINT) AS ss,
               microsecond(col1) % 1000000 // 1000 AS ms,
               microsecond(col1) % 1000000 AS us,
               isodow(col1) AS dow, dayofyear(col1) AS doy,
               year(cdate) AS dy
        FROM df_datetime
    """)


def test_datetime_diff_duration(spark, con, tbl):
    t = tbl("df_datetime")
    diff = t.col2 - t.col1
    out = t >> pdt.mutate(
        d_us=diff.dur.microseconds(),
        d_s=diff.dur.seconds(),
        d_d=diff.dur.days(),
    ) >> pdt.select(C.d_us, C.d_s, C.d_d)
    # DuckDB: epoch_us difference, then truncate-toward-zero division
    _check(spark, con, "datetime_diff", out, """
        SELECT epoch_us(col2) - epoch_us(col1) AS d_us,
               (epoch_us(col2) - epoch_us(col1)) // 1000000 AS d_s,
               (epoch_us(col2) - epoch_us(col1)) // 86400000000 AS d_d
        FROM df_datetime
    """)


def test_group_by_null_keys(spark, con, tbl):
    """Null grouping keys form their own group in both engines."""
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col2)
        >> pdt.summarize(
            n=pdt.count(),
            s1=t.col1.sum(),
            nn=t.col3.count(),
            mx=t.col4.max(),
        )
    )
    _check(spark, con, "group_null_keys", out, """
        SELECT col2, count(*) AS n, CAST(sum(col1) AS BIGINT) AS s1,
               count(col3) AS nn, max(col4) AS mx
        FROM df4 GROUP BY col2
    """)


def test_window_nulls_order(spark, con, tbl):
    """Window functions over a null-bearing unique key; nulls-first is the
    engine default (polars semantics)."""
    t = tbl("df4")
    out = (
        t
        >> pdt.group_by(t.col2)
        >> pdt.mutate(
            rn=pdt.row_number(arrange=[C.col4]),
            sh=t.col1.shift(1, arrange=[C.col4]),
            cs=t.col3.cum_sum(arrange=[C.col4]),
        )
        >> pdt.ungroup()
        >> pdt.select(t.col4, C.rn, C.sh, C.cs)
    )
    _check(spark, con, "window_nulls", out, """
        SELECT col4,
               row_number() OVER w AS rn,
               lag(col1) OVER w AS sh,
               sum(col3) OVER (PARTITION BY col2 ORDER BY col4
                   ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        FROM df4
        WINDOW w AS (PARTITION BY col2 ORDER BY col4 ASC NULLS FIRST)
    """)


def test_union_lca(spark, con, tbl):
    """union reconciles Int64 vs Float64 via least-common-ancestor."""
    a = tbl("df2") >> pdt.select(C.col1)
    t2 = tbl("df2")
    b = (
        t2
        >> pdt.mutate(col1_f=t2.col3)
        >> pdt.select(C.col1_f)
        >> pdt.rename({"col1_f": "col1"})
    )
    out = a >> pdt.union(b)
    _check(spark, con, "union_lca", out, """
        SELECT CAST(col1 AS DOUBLE) AS col1 FROM df2
        UNION ALL SELECT col3 FROM df2
    """)


def test_case_when_null_branch(spark, con, tbl):
    t = tbl("df4")
    out = t >> pdt.mutate(
        tier=pdt.when(t.col1 > 1).then(pdt.lit("hi"))
        .when(t.col1 >= 0).then(pdt.lit("lo"))
        .otherwise(pdt.lit(None)),
        mapped=t.col2.map({0: "zero", 1: "one"}, default="other"),
    ) >> pdt.select(t.col1, t.col2, C.tier, C.mapped)
    _check(spark, con, "case_null", out, """
        SELECT col1, col2,
               CASE WHEN col1 > 1 THEN 'hi'
                    WHEN col1 >= 0 THEN 'lo' END AS tier,
               CASE WHEN col2 = 0 THEN 'zero' WHEN col2 = 1 THEN 'one'
                    ELSE 'other' END AS mapped
        FROM df4
    """)


def test_arrange_nulls_markers(spark, con, tbl):
    t = tbl("df4")
    out = (
        t
        >> pdt.arrange(t.col2.descending().nulls_last(), t.col4.nulls_first())
        >> pdt.mutate(rn=pdt.row_number(arrange=[]))
        >> pdt.select(t.col4, C.rn)
    )
    _check(spark, con, "arrange_markers", out, """
        SELECT col4, row_number() OVER (
            ORDER BY col2 DESC NULLS LAST, col4 ASC NULLS FIRST) AS rn
        FROM df4
    """)


def test_division_by_zero_is_null_any_ansi(spark, con, tbl):
    """x / 0, x // 0, x % 0 are NULL — in BOTH ANSI modes (try_divide /
    nullif-guarded div / try_mod), matching DuckDB.  df2.col2 contains
    zeros and NULLs; col3 contains 0.0."""
    t = tbl("df2")
    out = t >> pdt.mutate(
        q=(t.col1 / t.col2).round(6),
        fq=(t.col3 / t.col3).round(6),
        i=t.col1 // t.col2,
        m=t.col1 % t.col2,
    ) >> pdt.select(t.col1, t.col2, C.q, C.fq, C.i, C.m)
    _check(spark, con, "div_by_zero", out, """
        SELECT col1, col2, round(col1 / col2, 6) AS q,
               round(col3 / col3, 6) AS fq,
               col1 // col2 AS i, col1 % col2 AS m
        FROM df2
    """)


def test_first_last_filter_excludes_all(spark, con, tbl):
    """first/last with a filter= that excludes every row of some group
    must be NULL (F.get on the empty collected array — element_at would
    raise INVALID_ARRAY_INDEX under ANSI; DuckDB FILTER yields NULL)."""
    t = tbl("df3")
    out = (
        t
        >> pdt.group_by(t.col2)
        >> pdt.summarize(
            f=t.col4.first(arrange=[t.col4], filter=t.col1 > 100),
            la=t.col4.last(arrange=[t.col4], filter=t.col1 > 100),
        )
    )
    _check(spark, con, "first_last_empty_filter", out, """
        SELECT col2,
               (array_agg(col4 ORDER BY col4) FILTER (col1 > 100))[1] AS f,
               list_reverse(array_agg(col4 ORDER BY col4)
                            FILTER (col1 > 100))[1] AS la
        FROM df3 GROUP BY col2
    """)
