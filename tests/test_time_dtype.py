"""The Time dtype (r14): µs-since-midnight LongType physical rep.

Reference surface (ops/ops/comparison.py:13-35 COMPARABLE,
tree/types.py Time, from_python/to_python): datetime.time literals,
comparisons, min/max aggregation, sorting, fill_null/coalesce/clip,
lca with NullType.  Beyond the reference: Datetime->Time and
String<->Time casts ('HH:MM:SS[.ffffff]', DuckDB's TIME text format).
"""
from __future__ import annotations

import datetime as dt

import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C

pytestmark = pytest.mark.usefixtures("ansi_both")


def _x(fn):
    """Make a plain callable usable as a pipe stage."""
    from pydiverse_transform_spark.operators.pipeable import verb

    return verb(fn)()


def _d(table):
    """Column-dict export that preserves None and int (ListOfRows —
    pandas would coerce nullable longs to float/NaN)."""
    rows = table >> pdt.export(pdt.ListOfRows)
    if not rows:
        return {}
    return {k: [r[k] for r in rows] for k in rows[0]}


def _us(t: dt.time) -> int:
    return ((t.hour * 60 + t.minute) * 60 + t.second) * 1_000_000 \
        + t.microsecond


@pytest.fixture()
def tt(spark):
    return pdt.Table(
        {"s": ["12:34:56.789123", "07:05:00", "23:59:59.999999",
               None, "00:00:00"],
         "d": [dt.datetime(2024, 1, 2, 12, 34, 56, 789123),
               dt.datetime(2024, 1, 2, 7, 5, 0),
               dt.datetime(2024, 1, 2, 23, 59, 59, 999999),
               dt.datetime(2024, 1, 2, 0, 0, 0),
               None]},
        name="tt")


def test_string_to_time_parse(tt):
    out = tt >> pdt.mutate(t=tt.s.cast(pdt.Time())) >> _x(_d)
    assert out["t"] == [
        _us(dt.time(12, 34, 56, 789123)), _us(dt.time(7, 5)),
        _us(dt.time(23, 59, 59, 999999)), None, 0]


@pytest.mark.parametrize("bad", ["xx", "24:00:00", "12:60:00",
                                 "12:00:60", "7:05", "12:34:56.1234567"])
def test_string_to_time_invalid(spark, bad):
    t = pdt.Table({"s": [bad]}, name="t")
    # non-strict nulls, strict raises — in EITHER ansi mode
    soft = t >> pdt.mutate(x=t.s.cast(pdt.Time(), strict=False)) \
        >> _x(_d)
    assert soft["x"] == [None]
    with pytest.raises(Exception, match="strict cast to time"):
        t >> pdt.mutate(x=t.s.cast(pdt.Time())) >> _x(_d)


def test_datetime_to_time_wall_clock(tt):
    out = tt >> pdt.mutate(t=tt.d.cast(pdt.Time())) >> _x(_d)
    assert out["t"] == [
        _us(dt.time(12, 34, 56, 789123)), _us(dt.time(7, 5)),
        _us(dt.time(23, 59, 59, 999999)), 0, None]


def test_time_to_string_matches_duckdb_text(spark):
    """'HH:MM:SS' with minimal fraction — byte-identical to DuckDB's
    TIME -> VARCHAR (the oracle q_time_ops hashes against)."""
    import duckdb

    vals = ["12:34:56.789123", "12:34:56.789000", "12:34:56.500000",
            "07:05:00", "00:00:00.000001", "23:59:59.999999"]
    t = pdt.Table({"s": vals}, name="t")
    got = (t >> pdt.mutate(
        x=t.s.cast(pdt.Time()).cast(pdt.String()))
        >> _x(_d))["x"]
    want = [duckdb.sql(
        f"SELECT CAST(TIME '{v}' AS VARCHAR)").fetchone()[0]
        for v in vals]
    assert got == want


def test_time_comparisons_and_literals(tt):
    out = (tt >> pdt.mutate(t=tt.s.cast(pdt.Time(), strict=False))
           >> pdt.mutate(
               pm=C.t >= dt.time(12, 0),
               eq=C.t == dt.time(7, 5),
               inn=C.t.is_in(dt.time(0, 0), dt.time(7, 5)))
           >> _x(_d))
    assert out["pm"] == [True, False, True, None, False]
    assert out["eq"] == [False, True, False, None, False]
    assert out["inn"] == [False, True, False, None, True]


def test_time_min_max_sort_clip(tt):
    agg = (tt >> pdt.mutate(t=tt.s.cast(pdt.Time(), strict=False))
           >> pdt.summarize(mx=C.t.max(), mn=C.t.min())
           >> _x(_d))
    assert agg["mx"] == [_us(dt.time(23, 59, 59, 999999))]
    assert agg["mn"] == [0]
    ordered = (tt >> pdt.mutate(t=tt.s.cast(pdt.Time(), strict=False))
               >> pdt.arrange(C.t.nulls_last())
               >> _x(_d))
    assert ordered["t"][:2] == [0, _us(dt.time(7, 5))]
    assert ordered["t"][-1] is None
    clipped = (tt >> pdt.mutate(
        t=tt.s.cast(pdt.Time(), strict=False))
        >> pdt.mutate(c=C.t.clip(dt.time(6, 0), dt.time(13, 0)))
        >> _x(_d))
    assert clipped["c"] == [
        _us(dt.time(12, 34, 56, 789123)), _us(dt.time(7, 5)),
        _us(dt.time(13, 0)), None, _us(dt.time(6, 0))]


def test_time_fill_null_coalesce_lca_null(tt):
    out = (tt >> pdt.mutate(t=tt.s.cast(pdt.Time(), strict=False))
           >> pdt.mutate(
               f=C.t.fill_null(dt.time(1, 2, 3)),
               co=pdt.coalesce(C.t, pdt.lit(dt.time(4, 5, 6))),
               # case branch with a None default: lca(Time, NullType)
               cw=pdt.when(C.t >= dt.time(12, 0)).then(C.t).otherwise(None))
           >> _x(_d))
    assert out["f"][3] == _us(dt.time(1, 2, 3))
    assert out["co"][3] == _us(dt.time(4, 5, 6))
    assert out["cw"] == [_us(dt.time(12, 34, 56, 789123)), None,
                         _us(dt.time(23, 59, 59, 999999)), None, None]


def test_time_ingest_dict(spark):
    t = pdt.Table({"t": [dt.time(1, 2, 3), None,
                         dt.time(23, 59, 59, 5)]}, name="t")
    assert isinstance(t.t.dtype(), pdt.Time)
    out = t >> pdt.mutate(s=t.t.cast(pdt.String())) >> _x(_d)
    assert out["t"] == [_us(dt.time(1, 2, 3)), None,
                        _us(dt.time(23, 59, 59, 5))]
    assert out["s"] == ["01:02:03", None, "23:59:59.000005"]


def test_time_ingest_mixed_rejected(spark):
    with pytest.raises(TypeError, match="mixes"):
        pdt.Table({"t": [dt.time(1, 2), "x"]}, name="t")
    with pytest.raises(TypeError, match="naive"):
        pdt.Table({"t": [dt.time(1, 2, tzinfo=dt.timezone.utc)]},
                  name="t")


def test_time_ingest_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1.5, 2.5],
                        "t": [dt.time(6, 30), None]})
    t = pdt.from_pandas(spark, pdf)
    assert isinstance(t.t.dtype(), pdt.Time)
    out = t >> _x(_d)
    assert out["t"] == [_us(dt.time(6, 30)), None]
    assert out["a"] == [1.5, 2.5]


def test_time_ingest_polars(spark):
    pl = pytest.importorskip("polars")
    pldf = pl.DataFrame({"t": [dt.time(6, 30, 15, 250), None],
                         "x": [1, 2]})
    assert pldf.schema["t"] == pl.Time
    t = pdt.from_polars(spark, pldf)
    assert isinstance(t.t.dtype(), pdt.Time)
    out = t >> pdt.arrange(C.x) >> _x(_d)
    assert out["t"] == [_us(dt.time(6, 30, 15, 250)), None]


def test_time_literal_dtype_inference():
    assert isinstance(pdt.lit(dt.time(1, 2)).dtype(), pdt.Time)


def test_time_tz_aware_literal_rejected(spark):
    t = pdt.Table({"a": [1]}, name="t")
    with pytest.raises(TypeError, match="naive"):
        (t >> pdt.mutate(
            x=pdt.lit(dt.time(1, 2, tzinfo=dt.timezone.utc)))
            >> _x(_d))
