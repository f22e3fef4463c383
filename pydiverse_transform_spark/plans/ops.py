"""Operator registry: every scalar/aggregate/window operator of the engine.

Each op declares its function type (element-wise E / aggregate A /
window-only W, reference ops/op.py:13-16), a result-dtype inference rule
and a compile rule emitting JVM-side ``pyspark.sql.functions`` Columns
(never row-at-a-time Python UDFs — everything here stays inside
whole-stage codegen).

Semantics contracts come from the reference's operator docstrings
(reference ops/ops/*.py), notably:
- floordiv/mod use C semantics (round toward zero / sign of dividend,
  reference ops/ops/arithmetic.py:52-127).  Spark's ``%`` and ``div``
  already behave this way.
- ``is_in`` is null-propagating (an OR-chain of ``==``, reference
  ops/ops/comparison.py:58-67) — NOT SQL ``IN``-with-literals.
- aggregate over empty/all-null group yields null (Spark native).
- Durations are total microseconds (LongType), see types.Duration.
"""

from __future__ import annotations

import functools
import math
import operator as _py_op

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import types as tp
from .expr import (
    FTYPE_AGGREGATE,
    FTYPE_ELEMENT_WISE,
    FTYPE_WINDOW,
    ColFn,
)

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
US_PER_MIN = 60_000_000
US_PER_SEC = 1_000_000
US_PER_MS = 1_000


class Op:
    __slots__ = ("name", "ftype", "infer", "compile", "agg", "needs_order")

    def __init__(self, name, ftype, infer, compile=None, agg=None,
                 needs_order=False):
        self.name = name
        self.ftype = ftype
        self.infer = infer  # (node) -> Dtype ; children dtypes resolved
        self.compile = compile  # E: (node, args) -> Column
        self.agg = agg  # A: (node, args) -> unwindowed aggregate Column
        self.needs_order = needs_order  # W ops that require an ORDER BY


REGISTRY: dict[str, Op] = {}


def _reg(name, ftype, infer, compile=None, agg=None, needs_order=False):
    REGISTRY[name] = Op(name, ftype, infer, compile, agg, needs_order)


def _dt(node, i=0):
    return node.args[i]._dtype


def _err(node, msg):
    args = ", ".join(repr(a._dtype) for a in node.args)
    raise TypeError(f"`{node.op}`: {msg} (arg types: {args})")


# --- dtype inference helpers ------------------------------------------------

def _infer_same(node):
    return _dt(node)


def _infer_bool(node):
    return tp.Bool()


def _infer_int(node):
    return tp.Int64()


def _infer_float(node):
    return tp.Float64()


def _infer_string(node):
    return tp.String()


def _infer_numeric_bin(node):
    a, b = _dt(node, 0), _dt(node, 1)
    if not (a.is_numeric() or isinstance(a, tp.NullType)) or not (
        b.is_numeric() or isinstance(b, tp.NullType)
    ):
        _err(node, "expected numeric arguments")
    return tp.lca_type(a, b)


def _infer_comparable(node):
    a, b = _dt(node, 0), _dt(node, 1)
    tp.lca_type(a, b)  # raises if incompatible
    return tp.Bool()


# --- duration/timestamp arithmetic helpers ----------------------------------
#
# The driver testdata carries TIMESTAMP_NTZ columns, on which Spark's
# unix_micros / cast-to-long are illegal.  All timestamp arithmetic here is
# *wall-clock* based so it is deterministic regardless of the session
# timezone and matches naive-timestamp SQL engines exactly.

import datetime as _pydt

_EPOCH_DATE = _pydt.date(1970, 1, 1)


def _epoch_us(ts: Column) -> Column:
    """Wall-clock microseconds since 1970-01-01 00:00:00 (works on both
    TIMESTAMP and TIMESTAMP_NTZ; equals DuckDB's epoch_us on naive ts)."""
    return (
        F.datediff(F.to_date(ts), F.lit(_EPOCH_DATE)).cast("long")
        * F.lit(US_PER_DAY)
        + F.hour(ts).cast("long") * F.lit(US_PER_HOUR)
        + F.minute(ts).cast("long") * F.lit(US_PER_MIN)
        + (F.date_part(F.lit("SECOND"), ts) * F.lit(US_PER_SEC)).cast("long")
    )


def _ts_plus_us(ts: Column, us: Column) -> Column:
    # decimal division keeps exact microseconds; ntz + interval -> ntz
    secs = us.cast("decimal(25,6)") / F.lit(US_PER_SEC)
    return ts + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def _is(d, klass):
    return isinstance(d, klass)


# =============================================================================
# arithmetic
# =============================================================================

def _infer_add(node):
    a, b = _dt(node, 0), _dt(node, 1)
    if _is(a, tp.String) and _is(b, tp.String):
        return tp.String()
    if _is(a, tp.Bool) and _is(b, tp.Bool):
        return tp.Int64()  # bools pre-cast to int64 (reference pipe/verbs.py:1625)
    if _is(a, tp.Datetime) and _is(b, tp.Duration):
        return tp.Datetime()
    if _is(a, tp.Duration) and _is(b, tp.Datetime):
        return tp.Datetime()
    if _is(a, tp.Duration) and _is(b, tp.Duration):
        return tp.Duration()
    return _infer_numeric_bin(node)


def _compile_add(node, args):
    a, b = _dt(node, 0), _dt(node, 1)
    x, y = args
    if _is(a, tp.String) and _is(b, tp.String):
        return F.concat(x, y)
    if _is(a, tp.Bool) and _is(b, tp.Bool):
        return x.cast("long") + y.cast("long")
    if _is(a, tp.Datetime) and _is(b, tp.Duration):
        return _ts_plus_us(x, y)
    if _is(a, tp.Duration) and _is(b, tp.Datetime):
        return _ts_plus_us(y, x)
    return x + y


_reg("add", FTYPE_ELEMENT_WISE, _infer_add, _compile_add)


def _infer_sub(node):
    a, b = _dt(node, 0), _dt(node, 1)
    if _is(a, tp.Datetime) and _is(b, tp.Datetime):
        return tp.Duration()
    if _is(a, tp.Date) and _is(b, tp.Date):
        return tp.Duration()
    if _is(a, tp.Datetime) and _is(b, tp.Duration):
        return tp.Datetime()
    if _is(a, tp.Duration) and _is(b, tp.Duration):
        return tp.Duration()
    return _infer_numeric_bin(node)


def _compile_sub(node, args):
    a, b = _dt(node, 0), _dt(node, 1)
    x, y = args
    if _is(a, tp.Datetime) and _is(b, tp.Datetime):
        return _epoch_us(x) - _epoch_us(y)
    if _is(a, tp.Date) and _is(b, tp.Date):
        return F.datediff(x, y).cast("long") * F.lit(US_PER_DAY)
    if _is(a, tp.Datetime) and _is(b, tp.Duration):
        return _ts_plus_us(x, -y)
    return x - y


_reg("sub", FTYPE_ELEMENT_WISE, _infer_sub, _compile_sub)

_reg("mul", FTYPE_ELEMENT_WISE, _infer_numeric_bin, lambda n, a: a[0] * a[1])


def _infer_truediv(node):
    _infer_numeric_bin(node)
    return tp.Float64()


# Spark already float-divides integers (unlike SQL engines).  try_divide
# (not `/`) so x/0 is NULL in BOTH ANSI modes — the engine contract is
# null-on-edge like the DuckDB/SQL backends of the reference, independent
# of the cluster's spark.sql.ansi.enabled (true is the Spark 4 default,
# under which bare `/` raises DIVIDE_BY_ZERO).
_reg("truediv", FTYPE_ELEMENT_WISE, _infer_truediv,
     lambda n, a: F.try_divide(a[0], a[1]))


def _div_toward_zero(x: Column, y: Column) -> Column:
    """Integer division rounding toward zero (C semantics,
    reference ops/ops/arithmetic.py:52-86).  Spark's `div` operator is
    IntegralDivide == truncation toward zero; `%` already has
    sign-of-dividend semantics, so (x - x % y) is exactly divisible.
    The divisor goes through nullif(y, 0): division by NULL is NULL in
    every mode, so x // 0 is NULL under ANSI and non-ANSI alike
    (matching the DuckDB oracle) instead of raising on ANSI clusters."""
    y = F.nullif(y.cast("long"), F.lit(0).cast("long"))
    try:
        return F.call_function("div", x.cast("long"), y)
    except Exception:
        return ((x - (x % y)) / y).cast("long")


def _infer_intdiv(node):
    a, b = _dt(node, 0), _dt(node, 1)
    if not (a.is_int() or _is(a, tp.NullType)) or not (
        b.is_int() or _is(b, tp.NullType)
    ):
        _err(node, "floordiv/mod require integer arguments")
    return tp.lca_type(a, b)


_reg("floordiv", FTYPE_ELEMENT_WISE, _infer_intdiv,
     lambda n, a: _div_toward_zero(a[0], a[1]))
# try_mod keeps Spark's sign-of-dividend (C) semantics but returns NULL
# for x % 0 in both ANSI modes (bare `%` raises REMAINDER_BY_ZERO under
# the Spark 4 ANSI default; DuckDB oracle yields NULL).
_reg("mod", FTYPE_ELEMENT_WISE, _infer_intdiv,
     lambda n, a: F.try_mod(a[0], a[1]))


def _infer_pow(node):
    _infer_numeric_bin(node)
    return tp.Float64()  # Int ** Int -> Float (reference ops/ops/numeric.py:14)


_reg("pow", FTYPE_ELEMENT_WISE, _infer_pow, lambda n, a: F.pow(a[0], a[1]))
_reg("neg", FTYPE_ELEMENT_WISE, _infer_same, lambda n, a: -a[0])
_reg("pos", FTYPE_ELEMENT_WISE, _infer_same, lambda n, a: a[0])
_reg("abs", FTYPE_ELEMENT_WISE, _infer_same, lambda n, a: F.abs(a[0]))


def _compile_round(node, args):
    d = node.args[1].val if len(node.args) > 1 else 0
    return F.round(args[0], d)


_reg("round", FTYPE_ELEMENT_WISE, _infer_same, _compile_round)


def _floorceil(fn):
    def compile_(node, args):
        out = fn(args[0])
        if _dt(node).is_float():
            # Spark floor/ceil(double) returns BIGINT; reference keeps Float.
            out = out.cast("double")
        return out

    return compile_


_reg("floor", FTYPE_ELEMENT_WISE, _infer_same, _floorceil(F.floor))
_reg("ceil", FTYPE_ELEMENT_WISE, _infer_same, _floorceil(F.ceil))

for _name, _f in [
    ("exp", F.exp), ("log", F.log), ("log10", F.log10), ("sin", F.sin),
    ("cos", F.cos), ("tan", F.tan), ("asin", F.asin), ("acos", F.acos),
    ("atan", F.atan), ("sqrt", F.sqrt), ("cbrt", F.cbrt),
]:
    _reg(_name, FTYPE_ELEMENT_WISE, _infer_float,
         (lambda f: lambda n, a: f(a[0]))(_f))

_INF = float("inf")
_reg("is_inf", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: F.abs(a[0]) == F.lit(_INF))
_reg("is_not_inf", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: F.abs(a[0]) != F.lit(_INF))
# null-propagating like every reference backend (duckdb isnan(NULL)=NULL,
# polars is_nan on null=null) — Spark's bare F.isnan(NULL) is false
_reg("is_nan", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: F.when(a[0].isNull(), F.lit(None)).otherwise(F.isnan(a[0])))
_reg("is_not_nan", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: F.when(a[0].isNull(), F.lit(None)).otherwise(~F.isnan(a[0])))
_reg("rand", FTYPE_ELEMENT_WISE, _infer_float, lambda n, a: F.rand())


# =============================================================================
# comparison / null ops
# =============================================================================

_reg("eq", FTYPE_ELEMENT_WISE, _infer_comparable, lambda n, a: a[0] == a[1])
_reg("ne", FTYPE_ELEMENT_WISE, _infer_comparable, lambda n, a: a[0] != a[1])
_reg("lt", FTYPE_ELEMENT_WISE, _infer_comparable, lambda n, a: a[0] < a[1])
_reg("le", FTYPE_ELEMENT_WISE, _infer_comparable, lambda n, a: a[0] <= a[1])
_reg("gt", FTYPE_ELEMENT_WISE, _infer_comparable, lambda n, a: a[0] > a[1])
_reg("ge", FTYPE_ELEMENT_WISE, _infer_comparable, lambda n, a: a[0] >= a[1])
_reg("is_null", FTYPE_ELEMENT_WISE, _infer_bool, lambda n, a: a[0].isNull())
_reg("is_not_null", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: a[0].isNotNull())


def _infer_fill_null(node):
    return tp.lca_type(_dt(node, 0), _dt(node, 1))


_reg("fill_null", FTYPE_ELEMENT_WISE, _infer_fill_null,
     lambda n, a: F.coalesce(a[0], a[1]))


def _compile_is_in(node, args):
    # null-propagating OR-chain of == (reference ops/ops/comparison.py:58-67);
    # NOT `.isin`, whose null semantics differ.
    x = args[0]
    if len(args) == 1:  # x.is_in() with no values is vacuously false
        return F.lit(False)
    return functools.reduce(_py_op.or_, (x == v for v in args[1:]))


_reg("is_in", FTYPE_ELEMENT_WISE, _infer_bool, _compile_is_in)


def _compile_clip(node, args):
    x, lo, hi = args
    # null input -> null output (reference ops/ops/comparison.py:70-79)
    return F.when(x.isNull(), F.lit(None)).otherwise(
        F.greatest(F.least(x, hi), lo)
    )


_reg("clip", FTYPE_ELEMENT_WISE, _infer_same, _compile_clip)


# =============================================================================
# logical (three-valued Kleene — Spark natively matches)
# =============================================================================

_reg("bool_and", FTYPE_ELEMENT_WISE, _infer_bool, lambda n, a: a[0] & a[1])
_reg("bool_or", FTYPE_ELEMENT_WISE, _infer_bool, lambda n, a: a[0] | a[1])
# Kleene xor == `!=` on bools (reference backend/sql.py:686-688)
_reg("bool_xor", FTYPE_ELEMENT_WISE, _infer_bool, lambda n, a: a[0] != a[1])
_reg("bool_invert", FTYPE_ELEMENT_WISE, _infer_bool, lambda n, a: ~a[0])


# =============================================================================
# strings
# =============================================================================

_WS_EDGE = r"^\s+|\s+$"

_reg("str_strip", FTYPE_ELEMENT_WISE, _infer_string,
     # strips all whitespace (polars semantics), not just spaces like TRIM
     lambda n, a: F.regexp_replace(a[0], _WS_EDGE, ""))
_reg("str_upper", FTYPE_ELEMENT_WISE, _infer_string, lambda n, a: F.upper(a[0]))
_reg("str_lower", FTYPE_ELEMENT_WISE, _infer_string, lambda n, a: F.lower(a[0]))
_reg("str_len", FTYPE_ELEMENT_WISE, _infer_int,
     lambda n, a: F.length(a[0]).cast("long"))


def _compile_str_replace_all(node, args):
    # literal (non-regex) replacement — F.replace, not regexp_replace
    return F.replace(args[0], args[1], args[2])


_reg("str_replace_all", FTYPE_ELEMENT_WISE, _infer_string,
     _compile_str_replace_all)
_reg("str_starts_with", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: F.startswith(a[0], a[1]))
_reg("str_ends_with", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: F.endswith(a[0], a[1]))


def _compile_str_contains(node, args):
    pattern = node.args[1].val
    allow_regex = node.args[2].val if len(node.args) > 2 else True
    if allow_regex:
        return args[0].rlike(pattern)
    return F.contains(args[0], F.lit(pattern))


_reg("str_contains", FTYPE_ELEMENT_WISE, _infer_bool, _compile_str_contains)


def _compile_str_slice(node, args):
    # reference is 0-based; SQL SUBSTRING is 1-based (same shift as
    # reference backend/sql.py:742-745)
    x, off, n = args
    return F.substring(x, off + F.lit(1), n)


_reg("str_slice", FTYPE_ELEMENT_WISE, _infer_string, _compile_str_slice)
_reg("str_to_datetime", FTYPE_ELEMENT_WISE, lambda n: tp.Datetime(),
     lambda n, a: F.to_timestamp(a[0]))
_reg("str_to_date", FTYPE_ELEMENT_WISE, lambda n: tp.Date(),
     lambda n, a: F.to_date(a[0]))
# literal-substring split (an extension verb; not in the reference) —
# \Q..\E-quote the separator so regex metacharacters split literally,
# matching DuckDB's string_split
_reg("str_split", FTYPE_ELEMENT_WISE, lambda n: tp.List(tp.String()),
     lambda n, a: F.split(a[0], "\\Q" + n.args[1].val + "\\E"))


# =============================================================================
# datetime / duration accessors
# =============================================================================

def _us_component(ts: Column) -> Column:
    # microsecond-of-second from the SECOND date part (NTZ-safe)
    return F.pmod(
        (F.date_part(F.lit("SECOND"), ts) * F.lit(US_PER_SEC)).cast("long"),
        F.lit(US_PER_SEC),
    )


for _name, _f in [
    ("dt_year", F.year), ("dt_month", F.month), ("dt_day", F.dayofmonth),
    ("dt_hour", F.hour), ("dt_minute", F.minute), ("dt_second", F.second),
    ("dt_day_of_year", F.dayofyear),
]:
    _reg(_name, FTYPE_ELEMENT_WISE, _infer_int,
         (lambda f: lambda n, a: f(a[0]).cast("long"))(_f))

_reg("dt_millisecond", FTYPE_ELEMENT_WISE, _infer_int,
     lambda n, a: (_us_component(a[0]) / F.lit(US_PER_MS)).cast("long"))
_reg("dt_microsecond", FTYPE_ELEMENT_WISE, _infer_int,
     lambda n, a: _us_component(a[0]))
# ISO: Mon=1..Sun=7 (reference ops/ops/datetime.py:49); F.weekday: Mon=0
_reg("dt_day_of_week", FTYPE_ELEMENT_WISE, _infer_int,
     lambda n, a: (F.weekday(a[0]) + F.lit(1)).cast("long"))

for _name, _unit in [
    ("dur_days", US_PER_DAY), ("dur_hours", US_PER_HOUR),
    ("dur_minutes", US_PER_MIN), ("dur_seconds", US_PER_SEC),
    ("dur_milliseconds", US_PER_MS), ("dur_microseconds", 1),
]:
    _reg(_name, FTYPE_ELEMENT_WISE, _infer_int,
         (lambda u: lambda n, a: _div_toward_zero(a[0], F.lit(u)))(_unit))


# =============================================================================
# aggregations (grouped aggregate AND window usage via generic machinery)
# =============================================================================

def _infer_agg_same(node):
    return _dt(node)


def _infer_mean(node):
    if not _dt(node).is_numeric():
        _err(node, "mean requires a numeric argument")
    return tp.Float64()


def _infer_sum(node):
    d = _dt(node)
    if _is(d, tp.Bool):
        return tp.Int64()
    if not d.is_numeric():
        _err(node, "sum requires a numeric or boolean argument")
    return d


def _agg_sum(node, args):
    x = args[0]
    if _is(_dt(node), tp.Bool):
        x = x.cast("long")
    return F.sum(x)


_reg("min", FTYPE_AGGREGATE, _infer_agg_same, agg=lambda n, a: F.min(a[0]))
_reg("max", FTYPE_AGGREGATE, _infer_agg_same, agg=lambda n, a: F.max(a[0]))
# value-at-extremum: x.arg_min(by) = the x of the row minimizing `by`
# (F.min_by/max_by — single hash-agg, same shuffle shape as min/max;
# ties are engine-arbitrary, so oracle checks use unique keys)
_reg("arg_min", FTYPE_AGGREGATE, _infer_agg_same,
     agg=lambda n, a: F.min_by(a[0], a[1]))
_reg("arg_max", FTYPE_AGGREGATE, _infer_agg_same,
     agg=lambda n, a: F.max_by(a[0], a[1]))
_reg("mean", FTYPE_AGGREGATE, _infer_mean, agg=lambda n, a: F.avg(a[0]))
_reg("sum", FTYPE_AGGREGATE, _infer_sum, agg=_agg_sum)
_reg("any", FTYPE_AGGREGATE, _infer_bool, agg=lambda n, a: F.bool_or(a[0]))
_reg("all", FTYPE_AGGREGATE, _infer_bool, agg=lambda n, a: F.bool_and(a[0]))
_reg("count", FTYPE_AGGREGATE, _infer_int,
     agg=lambda n, a: F.count(a[0] if a else F.lit(1)))
_reg("var", FTYPE_AGGREGATE, _infer_float, agg=lambda n, a: F.var_samp(a[0]))
_reg("std", FTYPE_AGGREGATE, _infer_float, agg=lambda n, a: F.stddev_samp(a[0]))
_reg("median", FTYPE_AGGREGATE, _infer_float,
     agg=lambda n, a: F.median(a[0]).cast("double"))
_reg("n_distinct", FTYPE_AGGREGATE, _infer_int,
     agg=lambda n, a: F.count_distinct(a[0]))

# approximate sketches (no reference analog; the scale path where exact
# count_distinct / percentile shuffle too much state): HyperLogLog++ and
# GK-quantile — both single-pass, mergeable, partial-aggregate friendly.
_reg("approx_n_distinct", FTYPE_AGGREGATE, _infer_int,
     agg=lambda n, a: F.approx_count_distinct(a[0]).cast("long"))


def _agg_approx_quantile(node, args):
    q = node.args[1].val
    return F.percentile_approx(args[0], q).cast("double")


_reg("approx_quantile", FTYPE_AGGREGATE, _infer_float,
     agg=_agg_approx_quantile)

# ordered aggregations — agg() receives the *struct-wrapped* value; the
# compiler (plans/compile.py) handles sort-within-group via
# collect_list(struct(keys..., v)) -> array_sort(comparator) -> transform.
_reg("str_join", FTYPE_AGGREGATE, _infer_string, agg=None)
_reg("list_agg", FTYPE_AGGREGATE, lambda n: tp.List(_dt(n)), agg=None)
# ordered positional aggregates: the value on the first/last row of the
# arrange= order (nulls kept — collect_list(struct) never drops rows)
_reg("first", FTYPE_AGGREGATE, _infer_agg_same, agg=None)
_reg("last", FTYPE_AGGREGATE, _infer_agg_same, agg=None)


# --- element-wise list ops (extensions beyond the reference) ----------------

def _infer_list_elem(node):
    a = _dt(node)
    if not isinstance(a, tp.List):
        _err(node, "expected a list column")
    return a.inner


def _infer_list_len(node):
    if not isinstance(_dt(node), tp.List):
        _err(node, "expected a list column")
    return tp.Int64()


def _infer_list_contains(node):
    a = _dt(node)
    if not isinstance(a, tp.List):
        _err(node, "expected a list column")
    tp.lca_type(a.inner, _dt(node, 1))  # raises if incompatible
    return tp.Bool()


def _infer_list_join(node):
    a = _dt(node)
    if not isinstance(a, tp.List) or not isinstance(a.inner, tp.String):
        _err(node, "expected a list<string> column")
    return tp.String()


_reg("list_len", FTYPE_ELEMENT_WISE, _infer_list_len,
     lambda n, a: F.array_size(a[0]).cast("long"))
# 0-based element access (python/polars convention); out of range -> null
_reg("list_get", FTYPE_ELEMENT_WISE, _infer_list_elem,
     lambda n, a: F.get(a[0], n.args[1].val))
_reg("list_contains", FTYPE_ELEMENT_WISE, _infer_list_contains,
     lambda n, a: F.array_contains(a[0], a[1]))
_reg("list_join", FTYPE_ELEMENT_WISE, _infer_list_join,
     lambda n, a: F.array_join(a[0], n.args[1].val))


# =============================================================================
# window-only ops (reference ops/ops/window.py)
# =============================================================================

def _infer_shift(node):
    return _dt(node)


_reg("shift", FTYPE_WINDOW, _infer_shift, needs_order=True)
_reg("row_number", FTYPE_WINDOW, lambda n: tp.Int64(), needs_order=True)
_reg("rank", FTYPE_WINDOW, lambda n: tp.Int64(), needs_order=True)
_reg("dense_rank", FTYPE_WINDOW, lambda n: tp.Int64(), needs_order=True)
_reg("percent_rank", FTYPE_WINDOW, lambda n: tp.Float64(),
     needs_order=True)
_reg("ntile", FTYPE_WINDOW, lambda n: tp.Int64(), needs_order=True)
_reg("cum_sum", FTYPE_WINDOW, _infer_sum, needs_order=True)
_reg("cum_max", FTYPE_WINDOW, _infer_agg_same, needs_order=True)
_reg("cum_min", FTYPE_WINDOW, _infer_agg_same, needs_order=True)


# =============================================================================
# horizontal (row-wise n-ary) — reference ops/ops/horizontal.py
# =============================================================================

def _infer_horizontal(node):
    out = _dt(node, 0)
    for a in node.args[1:]:
        out = tp.lca_type(out, a._dtype)
    return out


_reg("h_max", FTYPE_ELEMENT_WISE, _infer_horizontal,
     lambda n, a: F.greatest(*a) if len(a) > 1 else a[0])
_reg("h_min", FTYPE_ELEMENT_WISE, _infer_horizontal,
     lambda n, a: F.least(*a) if len(a) > 1 else a[0])
_reg("coalesce", FTYPE_ELEMENT_WISE, _infer_horizontal,
     lambda n, a: F.coalesce(*a))
_reg("h_any", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: functools.reduce(_py_op.or_, a))
_reg("h_all", FTYPE_ELEMENT_WISE, _infer_bool,
     lambda n, a: functools.reduce(_py_op.and_, a))
_reg("h_sum", FTYPE_ELEMENT_WISE, _infer_horizontal,
     lambda n, a: functools.reduce(_py_op.add, a))
