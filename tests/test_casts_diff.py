"""Cast-semantics differential tests vs DuckDB, modeled on reference
tests/test_backend_equivalence/test_ops/test_cast.py: float→int
truncation (toward zero, unlike DuckDB's round-half-even CAST),
int/float/datetime/date↔string round-trips, bool casts, and strict
out-of-range behavior.
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


@pytest.fixture()
def tbl(spark):
    def make(name):
        return pdt.from_dict(spark, ALL[name], name=name)

    return make


def _check(con, table, sql, name):
    ok, msg = compare(table >> pdt.export(pdt.Spark), con, sql, name)
    assert ok, msg


def test_float_to_int_truncates_toward_zero(spark, con, tbl):
    """Spark CAST(double AS bigint) truncates; DuckDB CAST rounds
    half-even, so the oracle must trunc() first."""
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(i=t.a.cast(pdt.Int64()))
        >> pdt.select(t.a, C.i)
    )
    _check(con, out, """
        SELECT a, CAST(trunc(a) AS BIGINT) AS i FROM df_num
    """, "float_to_int_trunc")


def test_float_to_int_out_of_range_raises(spark, tbl):
    """1e50 does not fit in Int64 — strict (default) cast must throw at
    execution (reference test_cast.py:42-46: all backends throw)."""
    t = tbl("df_num")
    bad = t >> pdt.mutate(i=t.pos.cast(pdt.Int64()))
    with pytest.raises(Exception, match="(?i)overflow|cast|range"):
        bad >> pdt.export(pdt.Pandas)


def test_float_to_int_out_of_range_nonstrict_nulls(spark, tbl):
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(i=t.pos.cast(pdt.Int64(), strict=False))
        >> pdt.export(pdt.Pandas)
    )
    # 1e50 and 1e-51 rows: overflow → null; tiny → 0
    assert out["i"].isna().sum() == 1


def test_int_to_string(spark, con, tbl):
    t = tbl("df_int")
    out = (
        t
        >> pdt.mutate(
            sa=t.a.cast(pdt.String()),
            sb=t.b.cast(pdt.String()),
            sn=t.neg.cast(pdt.String()),
        )
        >> pdt.select(C.sa, C.sb, C.sn)
    )
    _check(con, out, """
        SELECT CAST(a AS VARCHAR) AS sa, CAST(b AS VARCHAR) AS sb,
               CAST(neg AS VARCHAR) AS sn
        FROM df_int
    """, "int_to_string")


def test_float_to_string_roundtrip(spark, con, tbl):
    """Float→string formats differ between engines (1e50 vs 1.0E50), so
    compare the string→float round-trip like the reference does
    (test_cast.py:61-68)."""
    t = tbl("df_num")
    out = (
        t
        >> pdt.mutate(r=t.pos.cast(pdt.String()).cast(pdt.Float64()))
        >> pdt.select(t.pos, C.r)
    )
    _check(con, out, """
        SELECT pos, CAST(CAST(pos AS VARCHAR) AS DOUBLE) AS r FROM df_num
    """, "float_string_roundtrip")


def test_datetime_to_date(spark, con, tbl):
    t = tbl("df_datetime")
    # compare as strings: duckdb's fetchdf widens DATE back to a
    # midnight timestamp, which would never line up with date objects
    out = (
        t
        >> pdt.mutate(d1=t.col1.cast(pdt.Date()).cast(pdt.String()),
                      d2=t.col2.cast(pdt.Date()).cast(pdt.String()))
        >> pdt.select(C.d1, C.d2)
    )
    _check(con, out, """
        SELECT CAST(CAST(col1 AS DATE) AS VARCHAR) AS d1,
               CAST(CAST(col2 AS DATE) AS VARCHAR) AS d2
        FROM df_datetime
    """, "datetime_to_date")


def test_date_to_string(spark, con, tbl):
    t = tbl("df_datetime")
    out = (
        t
        >> pdt.mutate(s=t.cdate.cast(pdt.String()))
        >> pdt.select(C.s)
    )
    _check(con, out, """
        SELECT CAST(cdate AS VARCHAR) AS s FROM df_datetime
    """, "date_to_string")


def test_datetime_string_roundtrip(spark, con, tbl):
    t = tbl("df_datetime")
    out = (
        t
        >> pdt.mutate(r=t.col1.cast(pdt.String()).str.to_datetime())
        >> pdt.select(C.r)
    )
    _check(con, out, """
        SELECT CAST(CAST(col1 AS VARCHAR) AS TIMESTAMP) AS r
        FROM df_datetime
    """, "datetime_string_roundtrip")


def test_bool_casts(spark, con, tbl):
    t = tbl("df_bool")
    out = (
        t
        >> pdt.mutate(
            i=t.a.cast(pdt.Int64()),
            s=t.b.cast(pdt.String()),
            f=t.a.cast(pdt.Float64()),
        )
        >> pdt.select(C.i, C.s, C.f)
    )
    _check(con, out, """
        SELECT CAST(a AS BIGINT) AS i, CAST(b AS VARCHAR) AS s,
               CAST(a AS DOUBLE) AS f
        FROM df_bool
    """, "bool_casts")


def test_int_to_float_and_back(spark, con, tbl):
    t = tbl("df_int")
    out = (
        t
        >> pdt.mutate(f=t.pos.cast(pdt.Float64()),
                      i=t.pos.cast(pdt.Float64()).cast(pdt.Int64()))
        >> pdt.select(C.f, C.i)
    )
    _check(con, out, """
        SELECT CAST(pos AS DOUBLE) AS f,
               CAST(trunc(CAST(pos AS DOUBLE)) AS BIGINT) AS i
        FROM df_int
    """, "int_float_roundtrip")
