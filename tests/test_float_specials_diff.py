"""Float special-value differential tests vs DuckDB, modeled on
reference test_ops/test_ops_numerical.py: inf/nan literals and
round-trips, is_inf/is_nan, clip null-propagation, float-preserving
floor/ceil, Int**Int→Float pow, and ±0.0 in grouping.
"""

import duckdb
import math

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


@pytest.fixture()
def tbl(spark):
    def make(name):
        return pdt.from_dict(spark, ALL[name], name=name)

    return make


def _check(con, table, sql, name):
    ok, msg = compare(table >> pdt.export(pdt.Spark), con, sql, name)
    assert ok, msg


def test_inf_lit_roundtrip(spark, con, tbl):
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(
            inf=pdt.lit(float("inf")),
            ninf=pdt.lit(float("-inf")),
        )
        >> pdt.mutate(
            inf_back=C.inf.cast(pdt.String()).cast(pdt.Float64()),
            ninf_back=C.ninf.cast(pdt.String()).cast(pdt.Float64()),
        )
        >> pdt.select(C.inf, C.ninf, C.inf_back, C.ninf_back)
    )
    _check(con, out, """
        SELECT CAST('inf' AS DOUBLE) AS inf, CAST('-inf' AS DOUBLE) AS ninf,
               CAST('inf' AS DOUBLE) AS inf_back,
               CAST('-inf' AS DOUBLE) AS ninf_back
        FROM df_num
    """, "inf_lit_roundtrip")


def test_nan_lit_roundtrip(spark, con, tbl):
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(nan=pdt.lit(float("nan")))
        >> pdt.mutate(nan_back=C.nan.cast(pdt.String()).cast(pdt.Float64()))
        >> pdt.select(C.nan, C.nan_back)
    )
    _check(con, out, """
        SELECT CAST('nan' AS DOUBLE) AS nan, CAST('nan' AS DOUBLE) AS nan_back
        FROM df_num
    """, "nan_lit_roundtrip")


def test_is_inf_is_nan(spark, con, tbl):
    t = tbl("df_num")
    withs = (
        t
        >> pdt.mutate(v=pdt.when(t.zero == 0.0)
                      .then(t.pos / pdt.lit(1.0))
                      .otherwise(pdt.lit(float("inf"))))
    )
    out = (
        withs
        >> pdt.mutate(
            ii=(C.v * pdt.lit(float("inf"))).is_inf(),
            ni=(C.v * pdt.lit(float("inf"))).is_not_inf(),
            nn=(C.v - C.v).is_nan(),
            n2=(t.a + t.zero).is_not_nan(),
        )
        >> pdt.select(C.ii, C.ni, C.nn, C.n2)
    )
    _check(con, out, """
        SELECT isinf(pos * CAST('inf' AS DOUBLE)) AS ii,
               NOT isinf(pos * CAST('inf' AS DOUBLE)) AS ni,
               isnan(pos - pos) AS nn,
               CASE WHEN a IS NULL THEN NULL
                    ELSE NOT isnan(a + zero) END AS n2
        FROM df_num
    """, "is_inf_is_nan")


def test_clip_null_propagating(spark, con, tbl):
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(c=t.a.clip(pdt.lit(-1.0), pdt.lit(1.5)))
        >> pdt.select(t.a, C.c)
    )
    _check(con, out, """
        SELECT a, CASE WHEN a IS NULL THEN NULL
                       ELSE greatest(least(a, 1.5), -1.0) END AS c
        FROM df_num
    """, "clip_null_propagating")


def test_floor_ceil_preserve_float(spark, tbl):
    """floor/ceil on Float64 stay Float64 (reference semantics), not
    Int — and handle negatives correctly."""
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(f=t.a.floor(), c=t.a.ceil())
        >> pdt.export(pdt.Pandas)
    )
    assert str(out["f"].dtype) == "float64"
    assert str(out["c"].dtype) == "float64"
    got_f = [None if v is None or math.isnan(v) else v for v in out["f"]]
    exp_f = [None if v is None else float(math.floor(v))
             for v in ALL["df_num"]["a"]]
    assert got_f == exp_f


def test_int_pow_returns_float(spark, con, tbl):
    t = tbl("df_int")
    out = (
        t
        >> pdt.mutate(p=(t.a % 13) ** pdt.lit(3))
        >> pdt.select(C.p)
    )
    df = out >> pdt.export(pdt.Pandas)
    assert str(df["p"].dtype) == "float64"
    _check(con, out, """
        SELECT CAST(pow(a % 13, 3) AS DOUBLE) AS p FROM df_int
    """, "int_pow_float")


def test_neg_zero_grouping(spark, con, tbl):
    """-0.0 and 0.0 must land in one group in both engines."""
    t = tbl("df_num")
    out = (
        t
        >> pdt.group_by(t.zero)
        >> pdt.summarize(n=pdt.count())
    )
    _check(con, out, """
        SELECT zero, count(*) AS n FROM df_num GROUP BY zero
    """, "neg_zero_grouping")


def test_nan_ordering_and_agg(spark, con, tbl):
    """NaN sorts greater than any value in both engines; min/max skip
    nulls but NOT NaN."""
    t = tbl("df_num")
    withnan = t >> pdt.mutate(v=pdt.when(t.zero == 0.0)
                              .then(t.a)
                              .otherwise(t.a - t.a))
    out = (
        withnan
        >> pdt.arrange(C.v.nulls_last())
        >> pdt.mutate(r=pdt.row_number(arrange=[C.v.nulls_last(),
                                                t.pos.ascending()]))
        >> pdt.select(C.v, C.r)
    )
    _check(con, out, """
        SELECT v, row_number() OVER (ORDER BY v NULLS LAST, pos ASC) AS r
        FROM (SELECT pos, CASE WHEN zero = 0.0 THEN a ELSE a - a END AS v
              FROM df_num)
        ORDER BY v NULLS LAST
    """, "nan_ordering")
