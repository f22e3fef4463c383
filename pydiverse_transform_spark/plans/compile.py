"""Expression preparation + compilation to pyspark Columns.

Two passes over a user expression tree:

1. ``prepare(expr, scope, context)`` — clone the tree, resolve late-bound
   ``C.x`` names to UUID-identified Cols, validate UUIDs are in scope,
   inject the ambient grouping as ``partition_by`` into aggregate/window
   calls (reference pipe/verbs.py:1605-1611), and eagerly infer dtypes +
   function types so errors surface before execution (reference
   tree/col_expr.py:2386-2387).

2. ``compile_expr(expr, ctx)`` — emit a ``pyspark.sql.Column``.
   Aggregates outside ``summarize`` become window functions over the
   injected partition; ordered aggregations (str.join / list.agg with
   ``arrange=``) compile to ``collect_list(struct(keys..., v))`` →
   ``array_sort(comparator)`` → ``transform`` so sort-within-group stays
   JVM-side with no shuffle beyond the aggregation itself.
"""

from __future__ import annotations

import datetime as _dt
from typing import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .. import types as tp
from ..errors import ColumnNotFoundError, DataTypeError, FunctionTypeError
from .expr import (
    FTYPE_AGGREGATE,
    FTYPE_ELEMENT_WISE,
    FTYPE_WINDOW,
    CaseExpr,
    Cast,
    Col,
    ColExpr,
    ColFn,
    ColName,
    LiteralCol,
    Order,
)
from .ops import REGISTRY

__all__ = ["phys", "prepare", "prepare_order", "compile_expr", "compile_order",
           "CompileCtx", "expr_ftype", "Scope"]


def phys(u) -> str:
    """Stable physical column name for a column UUID."""
    return "c_" + u.hex


class Scope:
    """Name-resolution scope: all in-scope cols (incl. hidden) by UUID,
    visible display names, and the ambient grouping."""

    __slots__ = ("cols", "name2uuid", "partition_by")

    def __init__(self, cols: dict, name2uuid: dict, partition_by: list):
        self.cols = cols  # uuid -> Col
        self.name2uuid = name2uuid  # visible display name -> uuid
        self.partition_by = partition_by  # list[uuid]


# ---------------------------------------------------------------------------
# pass 1: prepare
# ---------------------------------------------------------------------------

def prepare(e, scope: Scope, context: str) -> ColExpr:
    """context: one of mutate/filter/summarize/arrange/join/group_by."""
    out = _prepare(e, scope, context, toplevel=True)
    if context in ("filter", "join"):
        _assert_no_agg_window(out, context)
    return out


def prepare_order(o, scope: Scope, context: str = "arrange") -> Order:
    o = Order.from_expr(o)
    e = _prepare(o.expr, scope, context, toplevel=True)
    _assert_no_agg_window(e, context)
    return Order(e, o.desc, o.nl)


def _prepare(e, scope: Scope, context: str, toplevel: bool = False) -> ColExpr:
    if isinstance(e, ColName):
        u = scope.name2uuid.get(e.name)
        if u is None:
            raise ColumnNotFoundError(
                f"column `{e.name}` not found; visible columns: "
                f"{list(scope.name2uuid)}"
            )
        return scope.cols[u]
    if isinstance(e, Col):
        if e.uuid not in scope.cols:
            raise ValueError(
                f"column {e!r} does not belong to (an ancestor of) this "
                f"table; use `alias()` for self-joins"
            )
        return e
    if isinstance(e, LiteralCol):
        return e
    if isinstance(e, Cast):
        inner = _prepare(e.expr, scope, context)
        if not tp.can_cast(inner._dtype, e.target):
            raise DataTypeError(f"cannot cast {inner._dtype!r} to {e.target!r}")
        out = Cast(inner, e.target, e.strict)
        out._ftype = inner.ftype()
        return out
    if isinstance(e, CaseExpr):
        cases = [
            (_prepare(c, scope, context), _prepare(v, scope, context))
            for c, v in e.cases
        ]
        default = (
            _prepare(e.default, scope, context) if e.default is not None else None
        )
        out = CaseExpr(cases, default)
        dtype = default._dtype if default is not None else tp.NullType()
        for c, v in cases:
            if not isinstance(c._dtype, (tp.Bool, tp.NullType)):
                raise TypeError(
                    f"`when` condition must be boolean, got {c._dtype!r}"
                )
            dtype = tp.lca_type(dtype, v._dtype)
        out._dtype = dtype
        ftypes = {x.ftype() for pair in cases for x in pair}
        out._ftype = _merge_ftypes(ftypes, "case expression")
        return out
    if isinstance(e, ColFn):
        return _prepare_fn(e, scope, context)
    raise TypeError(f"cannot use {e!r} as a column expression")


def _prepare_fn(e: ColFn, scope: Scope, context: str) -> ColFn:
    op = REGISTRY.get(e.op)
    if op is None:
        raise ValueError(f"unknown operator `{e.op}`")
    args = [_prepare(a, scope, context) for a in e.args]
    partition_by = (
        [_prepare(p, scope, context) for p in e.partition_by]
        if e.partition_by is not None
        else None
    )
    arrange = (
        [
            Order(_prepare(o.expr, scope, context), o.desc, o.nl)
            for o in e.arrange
        ]
        if e.arrange is not None
        else None
    )
    filt = _prepare(e.filter, scope, context) if e.filter is not None else None

    out = ColFn.__new__(ColFn)
    ColExpr.__init__(out)
    out.op = e.op
    out.args = args
    out.partition_by = partition_by
    out.arrange = arrange
    out.filter = filt

    if op.ftype in (FTYPE_AGGREGATE, FTYPE_WINDOW):
        for a in args:
            _assert_no_agg_window(a, f"arguments of `{e.op}`")
        if filt is not None:
            _assert_no_agg_window(filt, f"filter= of `{e.op}`")
        if context == "summarize":
            if op.ftype == FTYPE_WINDOW:
                raise FunctionTypeError(
                    f"window function `{e.op}` is not allowed in summarize"
                )
            if partition_by is not None:
                raise ValueError(
                    "partition_by= is not allowed inside summarize; the "
                    "grouping comes from group_by"
                )
        elif partition_by is None:
            # agg-in-mutate auto-promotes to a window over the ambient
            # grouping (reference pipe/verbs.py:1605-1611)
            out.partition_by = [scope.cols[u] for u in scope.partition_by]
        out._ftype = op.ftype
    else:
        ftypes = {a.ftype() for a in args}
        out._ftype = _merge_ftypes(ftypes, f"`{e.op}`")

    out._dtype = op.infer(out)
    return out


def _merge_ftypes(ftypes: set, what: str) -> str:
    ftypes.discard(FTYPE_ELEMENT_WISE)
    if not ftypes:
        return FTYPE_ELEMENT_WISE
    if len(ftypes) > 1:
        raise FunctionTypeError(
            f"cannot mix aggregate and window functions in {what}"
        )
    return ftypes.pop()


def _assert_no_agg_window(e: ColExpr, where: str):
    if isinstance(e, ColFn) and REGISTRY[e.op].ftype != FTYPE_ELEMENT_WISE:
        raise FunctionTypeError(
            f"aggregate/window function `{e.op}` is not allowed in {where}"
        )
    for c in e.iter_children():
        _assert_no_agg_window(c, where)


def expr_ftype(e: ColExpr) -> str:
    return e.ftype()


# ---------------------------------------------------------------------------
# pass 2: compile
# ---------------------------------------------------------------------------

class CompileCtx:
    __slots__ = ("in_summarize", "default_order")

    def __init__(self, in_summarize: bool = False,
                 default_order: Sequence[Order] = ()):
        self.in_summarize = in_summarize
        self.default_order = list(default_order)


def _lit(e: LiteralCol) -> Column:
    val = e.val
    if isinstance(val, _dt.timedelta):
        return F.lit(val // _dt.timedelta(microseconds=1))
    if isinstance(val, _dt.time):
        # Time's physical representation: µs since midnight (types.Time)
        if val.tzinfo is not None:
            raise TypeError(
                f"Time literals must be naive (no tzinfo): {val!r}")
        return F.lit(
            ((val.hour * 60 + val.minute) * 60 + val.second) * 1_000_000
            + val.microsecond).cast("long")
    out = F.lit(val)
    if e.explicit_dtype:
        # make the physical type match the declared logical type
        # (lit(1, Float64()) must be a double column, not an int)
        out = out.cast(tp.to_spark_type(e._dtype))
    return out


def compile_expr(e: ColExpr, ctx: CompileCtx) -> Column:
    if isinstance(e, Col):
        return F.col(phys(e.uuid))
    if isinstance(e, LiteralCol):
        return _lit(e)
    if isinstance(e, Cast):
        return _compile_cast(e, ctx)
    if isinstance(e, CaseExpr):
        return _compile_case(e, ctx)
    if isinstance(e, ColFn):
        op = REGISTRY[e.op]
        if op.ftype == FTYPE_ELEMENT_WISE:
            args = [compile_expr(a, ctx) for a in e.args]
            return op.compile(e, args)
        if op.ftype == FTYPE_AGGREGATE:
            return _compile_agg(e, op, ctx)
        return _compile_window(e, op, ctx)
    raise TypeError(f"cannot compile {e!r}")


def compile_order(o: Order, ctx: CompileCtx) -> Column:
    c = compile_expr(o.expr, ctx)
    nulls_last = o.nl if o.nl is not None else False
    if o.desc:
        return c.desc_nulls_last() if nulls_last else c.desc_nulls_first()
    return c.asc_nulls_last() if nulls_last else c.asc_nulls_first()


_INT_WIDTH = {"Int8": 1, "Int16": 2, "Int32": 4, "Int64": 8, "Int": 8,
              "UInt8": 2, "UInt16": 4, "UInt32": 8, "UInt64": 8}


def _strict_cast_can_fail(src: tp.Dtype | None, dst: tp.Dtype) -> bool:
    """Lossy source→target pairs where a strict cast can throw: string
    parses, float/decimal→int range, int narrowing, anything→decimal
    overflow.  Widening / always-safe casts return False and compile to
    a bare Spark cast with no try_cast probe."""
    if src is None or isinstance(src, tp.NullType):
        return False
    if isinstance(src, tp.String) and not isinstance(dst, tp.String):
        return True
    if src.is_float() and dst.is_int():
        return True
    if isinstance(dst, tp.Decimal):
        return True
    if src.is_int() and dst.is_int():
        sw = _INT_WIDTH.get(type(src).__name__, 8)
        dw = _INT_WIDTH.get(type(dst).__name__, 8)
        return dw < sw
    return False


# 'HH:MM:SS[.ffffff]' — seconds required, fraction up to µs precision
# (DuckDB's TIME text format, so string-cast behavior matches the oracle)
_TIME_STR_RE = r"^\s*(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?\s*$"

_US_PER_HOUR = 3_600_000_000
_US_PER_MIN = 60_000_000
_US_PER_SEC = 1_000_000


def _compile_time_cast(e: Cast, x: Column, src: tp.Dtype | None) -> Column:
    """Casts touching the Time dtype (µs-since-midnight LongType —
    types.Time).  The generic lane's bare Spark cast is wrong for every
    one of these (a LongType physical says nothing about time-of-day),
    so each pair compiles explicitly; all expressions are wall-clock
    and ANSI-mode-independent (reference ops/ops/comparison.py:13-35
    for the COMPARABLE surface this feeds)."""
    if isinstance(src, tp.Time):
        if isinstance(e.target, tp.Time):
            return x
        # Time -> String: 'HH:MM:SS' plus minimal fraction when nonzero
        # (matches DuckDB's TIME -> VARCHAR text form)
        h = F.lpad(F.floor(x / F.lit(_US_PER_HOUR)).cast("long")
                   .cast("string"), 2, "0")
        m = F.lpad(F.floor(F.pmod(x, F.lit(_US_PER_HOUR))
                           / F.lit(_US_PER_MIN)).cast("long")
                   .cast("string"), 2, "0")
        s = F.lpad(F.floor(F.pmod(x, F.lit(_US_PER_MIN))
                           / F.lit(_US_PER_SEC)).cast("long")
                   .cast("string"), 2, "0")
        frac = F.pmod(x, F.lit(_US_PER_SEC))
        base = F.concat(h, F.lit(":"), m, F.lit(":"), s)
        return F.when(
            frac == 0, base,
        ).otherwise(F.concat(
            base, F.lit("."),
            F.regexp_replace(
                F.lpad(frac.cast("string"), 6, "0"), "0+$", ""),
        ))
    if isinstance(src, tp.Datetime):
        # time-of-day of the wall-clock reading — valid on TIMESTAMP
        # and TIMESTAMP_NTZ alike (no unix_micros, which ntz forbids)
        return (
            F.hour(x).cast("long") * F.lit(_US_PER_HOUR)
            + F.minute(x).cast("long") * F.lit(_US_PER_MIN)
            + (F.date_part(F.lit("SECOND"), x)
               * F.lit(_US_PER_SEC)).cast("long")
        )
    if isinstance(src, tp.String):
        # parse components via try_cast so malformed inputs yield null
        # in EITHER ansi mode; strict then raises exactly like the
        # string->number strict lane (assert_true probe)
        hh = F.regexp_extract(x, _TIME_STR_RE, 1).try_cast("long")
        mm = F.regexp_extract(x, _TIME_STR_RE, 2).try_cast("long")
        ss = F.regexp_extract(x, _TIME_STR_RE, 3).try_cast("long")
        ff = F.rpad(F.regexp_extract(x, _TIME_STR_RE, 4), 6, "0") \
            .try_cast("long")
        valid = (hh.isNotNull() & (hh < 24) & (mm < 60) & (ss < 60))
        us = (hh * F.lit(_US_PER_HOUR) + mm * F.lit(_US_PER_MIN)
              + ss * F.lit(_US_PER_SEC) + F.coalesce(ff, F.lit(0)))
        if e.strict:
            bad = F.assert_true(
                x.isNull() | valid,
                F.concat(
                    F.lit("strict cast to time malformed or out of "
                          "range for value '"), x, F.lit("'")),
            )
            return F.when(bad.isNull() & valid, us)
        return F.when(valid, us)
    # NullType -> Time
    return x.cast("long")


def _compile_cast(e: Cast, ctx: CompileCtx) -> Column:
    x = compile_expr(e.expr, ctx)
    if isinstance(e.target, tp.Time) or isinstance(e.expr.dtype(), tp.Time):
        return _compile_time_cast(e, x, e.expr.dtype())
    if isinstance(e.target, tp.Enum):
        # String -> Enum validates membership (reference
        # tree/col_expr.py:2686-2722): strict raises at execution,
        # non-strict nulls invalid values
        member = x.isin(*e.target.values)
        if e.strict:
            bad = F.assert_true(
                x.isNull() | member,
                F.concat(F.lit("enum cast: invalid value '"), x, F.lit("'")),
            )
            return F.when(bad.isNull(), x)
        return F.when(member, x)
    st = tp.to_spark_type(e.target)
    if e.strict:
        casted = x.cast(st)
        if _strict_cast_can_fail(e.expr.dtype(), e.target):
            # reference contract (test_cast.py:42-46): strict cast of a
            # malformed / out-of-range value throws on EVERY backend.
            # Spark only raises under ANSI; non-ANSI silently
            # clamps/nulls.  try_cast is mode-independent (NULL on any
            # failure), so probe with it and raise via assert_true —
            # identical behavior whatever the cluster's
            # spark.sql.ansi.enabled.  Only lossy source→target pairs
            # pay the probe; widening casts stay a bare cast.
            probe = x.try_cast(st)
            bad = F.assert_true(
                x.isNull() | probe.isNotNull(),
                F.concat(
                    F.lit(f"strict cast to {e.target} out of range or "
                          "malformed for value '"),
                    x.cast("string"), F.lit("'"),
                ),
            )
            return F.when(bad.isNull(), casted)
        return casted
    try:
        return x.try_cast(st)
    except AttributeError:  # pyspark < 3.5 fallback
        return x.cast(st)


def _compile_case(e: CaseExpr, ctx: CompileCtx) -> Column:
    out = None
    for cond, val in e.cases:
        c = compile_expr(cond, ctx)
        v = compile_expr(val, ctx)
        out = F.when(c, v) if out is None else out.when(c, v)
    default = (
        compile_expr(e.default, ctx) if e.default is not None else F.lit(None)
    )
    if out is None:
        return default
    return out.otherwise(default)


# --- window spec helpers ----------------------------------------------------

def _partition_spec(e: ColFn, ctx: CompileCtx):
    parts = [compile_expr(p, ctx) for p in (e.partition_by or [])]
    return Window.partitionBy(*parts)


def _order_cols(e: ColFn, ctx: CompileCtx) -> list[Column]:
    """Ordering for an order-dependent window op.

    Spark DataFrames have no intrinsic row order, so a bare
    ``row_number()/shift()/cum_sum()`` with neither ``arrange=`` nor a
    preceding ``arrange()`` verb would be nondeterministic (its result
    depends on partition layout).  The reference requires an ordering for
    these ops (reference ops/ops/window.py:26-30); we enforce the same at
    compile time instead of silently producing run-dependent results.
    """
    orders = e.arrange
    if not orders:
        orders = ctx.default_order
    if not orders and REGISTRY[e.op].needs_order:
        raise ValueError(
            f"window function `{e.op}` requires an ordering: pass "
            "`arrange=` or sort the table with `arrange(...)` first "
            "(Spark DataFrames have no intrinsic row order)"
        )
    return [compile_order(o, ctx) for o in orders]


# --- aggregates ---------------------------------------------------------------

def _compile_agg(e: ColFn, op, ctx: CompileCtx) -> Column:
    if e.op in ("str_join", "list_agg", "first", "last"):
        return _compile_ordered_agg(e, ctx)
    args = [compile_expr(a, ctx) for a in e.args]
    if e.filter is not None:
        filt = compile_expr(e.filter, ctx)
        if args:
            args[0] = F.when(filt, args[0])
        else:
            args = [F.when(filt, F.lit(1))]
    if not ctx.in_summarize and e.op == "n_distinct":
        # count(DISTINCT ..) OVER is unsupported in Spark; collect_set
        # drops nulls exactly like count_distinct, so its size over the
        # window is the same number — and stays a single shuffle on the
        # partition key (no self-join decorrelation needed)
        return (
            F.size(F.collect_set(args[0]).over(_partition_spec(e, ctx)))
            .cast("long")
        )
    agg = op.agg(e, args)
    if ctx.in_summarize:
        return agg
    return agg.over(_partition_spec(e, ctx))


def _struct_comparator(orders: list[Order]):
    """Comparator for array_sort over structs {k0..kn, v} — stays a pure
    Catalyst expression (no Python UDF)."""

    def cmp(left: Column, right: Column) -> Column:
        res = F.lit(0)
        for i in reversed(range(len(orders))):
            o = orders[i]
            lk, rk = left[f"k{i}"], right[f"k{i}"]
            first = 1 if o.desc else -1  # value sorting earlier
            nulls_last = o.nl if o.nl is not None else False
            nullv = 1 if nulls_last else -1
            res = (
                F.when(lk.isNull() & rk.isNull(), res)
                .when(lk.isNull(), F.lit(nullv))
                .when(rk.isNull(), F.lit(-nullv))
                .when(lk < rk, F.lit(first))
                .when(lk > rk, F.lit(-first))
                .otherwise(res)
            )
        return res

    return cmp


def _compile_ordered_agg(e: ColFn, ctx: CompileCtx) -> Column:
    """str.join / list.agg with optional arrange= — sort-within-group via
    collect_list(struct) + array_sort(comparator) + transform (equivalent
    of the reference's ordered aggregation, backend/sql.py:284-288)."""
    value = compile_expr(e.args[0], ctx)
    orders = e.arrange or []
    if not orders and e.op in ("first", "last"):
        raise ValueError(
            f"`{e.op}` requires `arrange=` — without an order the result "
            "would depend on partition layout (Spark DataFrames have no "
            "intrinsic row order)"
        )
    fields = [
        compile_expr(o.expr, ctx).alias(f"k{i}") for i, o in enumerate(orders)
    ]
    st = F.struct(*fields, value.alias("v"))
    cond = compile_expr(e.filter, ctx) if e.filter is not None else None
    if e.op == "str_join":
        # string_agg skips nulls — drop null values before collecting
        not_null = value.isNotNull()
        cond = not_null if cond is None else (cond & not_null)
    if cond is not None:
        st = F.when(cond, st)
    arr = F.collect_list(st)
    if not ctx.in_summarize:
        arr = arr.over(_partition_spec(e, ctx))
    if orders:
        arr = F.array_sort(arr, _struct_comparator(orders))
    vals = F.transform(arr, lambda s: s["v"])
    if e.op == "str_join":
        delim = e.args[1].val
        return F.array_join(vals, delim)
    if e.op == "first":
        # struct elements are never null, so null VALUES survive the
        # collect (unlike a bare collect_list) — polars first/last
        # semantics.  F.get (0-indexed, NULL on out-of-bounds in every
        # ANSI mode) rather than element_at, which raises
        # INVALID_ARRAY_INDEX under ANSI when a `filter=` kwarg
        # excludes every row of a group (DuckDB: first(...) FILTER with
        # no rows is NULL).
        return F.get(vals, 0)
    if e.op == "last":
        return F.get(vals, F.size(vals) - 1)
    return vals


# --- window-only ops ----------------------------------------------------------

def _compile_window(e: ColFn, op, ctx: CompileCtx) -> Column:
    if ctx.in_summarize:
        raise ValueError(f"window function `{e.op}` is not allowed in summarize")
    w = _partition_spec(e, ctx).orderBy(*_order_cols(e, ctx))
    if e.op == "shift":
        x = compile_expr(e.args[0], ctx)
        n = e.args[1].val
        fill = e.args[2]
        if not isinstance(fill, LiteralCol):
            raise TypeError("shift fill_value must be a literal")
        fill_val = fill.val
        if n >= 0:
            return F.lag(x, n, fill_val).over(w)
        return F.lead(x, -n, fill_val).over(w)
    if e.op == "row_number":
        return F.row_number().over(w).cast("long")
    if e.op == "rank":
        return F.rank().over(w).cast("long")
    if e.op == "dense_rank":
        return F.dense_rank().over(w).cast("long")
    if e.op == "percent_rank":
        return F.percent_rank().over(w)
    if e.op == "ntile":
        return F.ntile(e.args[0].val).over(w).cast("long")
    if e.op == "cum_sum":
        x = compile_expr(e.args[0], ctx)
        if isinstance(e.args[0]._dtype, tp.Bool):
            x = x.cast("long")
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return F.sum(x).over(frame)
    if e.op in ("cum_max", "cum_min"):
        x = compile_expr(e.args[0], ctx)
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fn = F.max if e.op == "cum_max" else F.min
        return fn(x).over(frame)
    raise ValueError(f"unknown window op `{e.op}`")
