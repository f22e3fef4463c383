"""Column-expression tree.

Mirrors the semantics of the reference's expression layer
(reference: src/pydiverse/transform/_internal/tree/col_expr.py) but is
a fresh, much smaller design: nodes compile directly to
``pyspark.sql.Column`` (see plans/compile.py).  Function types
(element-wise / aggregate / window) follow reference
ops/op.py:13-16 with the composition rules of tree/col_expr.py:2478.
"""

from __future__ import annotations

import uuid as _uuid
from typing import Any, Iterable

from .. import types as tp

__all__ = [
    "ColExpr",
    "Col",
    "ColName",
    "LiteralCol",
    "ColFn",
    "CaseExpr",
    "WhenClause",
    "Cast",
    "Order",
    "wrap_literal",
    "FTYPE_ELEMENT_WISE",
    "FTYPE_AGGREGATE",
    "FTYPE_WINDOW",
]

FTYPE_ELEMENT_WISE = "E"
FTYPE_AGGREGATE = "A"
FTYPE_WINDOW = "W"


def wrap_literal(v) -> "ColExpr":
    if isinstance(v, ColExpr):
        return v
    if isinstance(v, Order):
        raise TypeError("ordering markers are only allowed in arrange/arrange=")
    # pandas/polars Series and numpy arrays become positional SeriesCol
    # nodes — only legal under eval_aligned (reference tree/col_expr.py:2771)
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes, dict)) and (
        hasattr(v, "to_list") or hasattr(v, "tolist")
    ):
        return SeriesCol(v.to_list() if hasattr(v, "to_list") else v.tolist())
    return LiteralCol(v)


def _fn(op_name: str, *args, **kwargs) -> "ColFn":
    return ColFn(op_name, *[wrap_literal(a) for a in args], **kwargs)


class ColExpr:
    """Base class for all column expressions."""

    __slots__ = ("_dtype", "_ftype")

    def __init__(self):
        self._dtype: tp.Dtype | None = None
        self._ftype: str | None = None

    # resolved lazily by the compiler against a schema
    def dtype(self) -> tp.Dtype | None:
        return self._dtype

    def ftype(self) -> str:
        return self._ftype or FTYPE_ELEMENT_WISE

    def iter_children(self) -> Iterable["ColExpr"]:
        return ()

    def _iter_cols_deep(self) -> Iterable["Col"]:
        if isinstance(self, Col):
            yield self
        for c in self.iter_children():
            yield from c._iter_cols_deep()

    def uses_table(self, table) -> bool:
        """Whether the expression contains a column of ``table`` or of a
        table ``table`` was derived into — NOT of tables derived FROM the
        column's table (reference col_expr.py:217-225: the check is
        AST-subtree containment, so ``t.a.uses_table(t >> mutate(...))``
        is False while ``(t >> mutate(...)).a.uses_table(t)`` is True)."""
        tid = id(table)
        for c in self._iter_cols_deep():
            o = c._origin
            if o is None:
                continue
            if o is table or tid in getattr(o, "_lineage_ids", ()):
                return True
        return False

    def export(self, target=None):
        """Evaluate this expression as a single column (reference
        col_expr.py:136-178).  There is no ambient table, so the
        expression must contain one column whose table snapshot contains
        every other column used; that table provides the rows.  Returns
        a pandas Series for ``Pandas`` (default), else whatever one-column
        frame the target produces."""
        from ..operators.verbs import export as _export
        from ..operators.verbs import mutate as _mutate
        from ..operators.verbs import select as _select
        from ..targets import Pandas

        cols = [c for c in self._iter_cols_deep() if c._origin is not None]
        if not cols:
            raise ValueError(
                "cannot export an expression without table columns; "
                "use pdt.Table + mutate for pure literals"
            )
        home = None
        for cand in {id(c._origin): c._origin for c in cols}.values():
            if all(c.uuid in cand._cols for c in cols):
                home = cand
                break
        if home is None:
            raise ValueError(
                "expression columns come from unrelated tables; no single "
                "table contains them all (reference col_expr.py:147-154)"
            )
        name = self.name if isinstance(self, Col) else "value"
        out = (
            home
            >> _mutate(**{name: self})
            >> _select(name)
            >> _export(target if target is not None else Pandas())
        )
        import pandas as pd

        if isinstance(out, pd.DataFrame):
            return out[name]
        return out

    def __str__(self):
        """Value preview (reference col_expr.py's ``__str__`` evaluates
        the expression against its table; failures print 'failed to
        execute query' instead of raising)."""
        try:
            s = self.export()
            head = f"{self!r} ({self._dtype!r})" if self._dtype else repr(self)
            return f"{head}\n{s.head(10).to_string(index=False)}"
        except Exception as e:
            return f"{self!r}\nfailed to execute query: {e}"

    def _repr_html_(self) -> str:
        try:
            s = self.export()
            return f"<code>{self!r}</code><br/>" + s.head(10).to_frame(
            ).to_html(index=False)
        except Exception as e:
            return f"<pre>failed to execute query: {e}</pre>"

    # ---- arithmetic ---------------------------------------------------
    def __add__(self, o):
        return _fn("add", self, o)

    def __radd__(self, o):
        return _fn("add", o, self)

    def __sub__(self, o):
        return _fn("sub", self, o)

    def __rsub__(self, o):
        return _fn("sub", o, self)

    def __mul__(self, o):
        return _fn("mul", self, o)

    def __rmul__(self, o):
        return _fn("mul", o, self)

    def __truediv__(self, o):
        return _fn("truediv", self, o)

    def __rtruediv__(self, o):
        return _fn("truediv", o, self)

    def __floordiv__(self, o):
        return _fn("floordiv", self, o)

    def __rfloordiv__(self, o):
        return _fn("floordiv", o, self)

    def __mod__(self, o):
        return _fn("mod", self, o)

    def __rmod__(self, o):
        return _fn("mod", o, self)

    def __pow__(self, o):
        return _fn("pow", self, o)

    def __rpow__(self, o):
        return _fn("pow", o, self)

    def __neg__(self):
        return _fn("neg", self)

    def __pos__(self):
        return _fn("pos", self)

    def abs(self):
        return _fn("abs", self)

    def round(self, decimals: int = 0):
        return _fn("round", self, LiteralCol(decimals, const=True))

    def floor(self):
        return _fn("floor", self)

    def ceil(self):
        return _fn("ceil", self)

    def exp(self):
        return _fn("exp", self)

    def log(self):
        return _fn("log", self)

    def log10(self):
        return _fn("log10", self)

    def sin(self):
        return _fn("sin", self)

    def cos(self):
        return _fn("cos", self)

    def tan(self):
        return _fn("tan", self)

    def asin(self):
        return _fn("asin", self)

    def acos(self):
        return _fn("acos", self)

    def atan(self):
        return _fn("atan", self)

    def sqrt(self):
        return _fn("sqrt", self)

    def cbrt(self):
        return _fn("cbrt", self)

    def is_inf(self):
        return _fn("is_inf", self)

    def is_not_inf(self):
        return _fn("is_not_inf", self)

    def is_nan(self):
        return _fn("is_nan", self)

    def is_not_nan(self):
        return _fn("is_not_nan", self)

    # ---- comparison ---------------------------------------------------
    def __eq__(self, o):  # type: ignore[override]
        return _fn("eq", self, o)

    def __ne__(self, o):  # type: ignore[override]
        return _fn("ne", self, o)

    def __lt__(self, o):
        return _fn("lt", self, o)

    def __le__(self, o):
        return _fn("le", self, o)

    def __gt__(self, o):
        return _fn("gt", self, o)

    def __ge__(self, o):
        return _fn("ge", self, o)

    def is_null(self):
        return _fn("is_null", self)

    def is_not_null(self):
        return _fn("is_not_null", self)

    def fill_null(self, v):
        return _fn("fill_null", self, v)

    def is_in(self, *values):
        return _fn("is_in", self, *values)

    def clip(self, lower, upper):
        return _fn("clip", self, lower, upper)

    # ---- logical ------------------------------------------------------
    def __and__(self, o):
        return _fn("bool_and", self, o)

    def __rand__(self, o):
        return _fn("bool_and", o, self)

    def __or__(self, o):
        return _fn("bool_or", self, o)

    def __ror__(self, o):
        return _fn("bool_or", o, self)

    def __xor__(self, o):
        return _fn("bool_xor", self, o)

    def __rxor__(self, o):
        return _fn("bool_xor", o, self)

    def __invert__(self):
        return _fn("bool_invert", self)

    # ---- aggregations (usable grouped or as windows) -------------------
    def min(self, *, partition_by=None, filter=None):
        return _fn("min", self, partition_by=partition_by, filter=filter)

    def max(self, *, partition_by=None, filter=None):
        return _fn("max", self, partition_by=partition_by, filter=filter)

    def arg_min(self, by, *, partition_by=None, filter=None):
        """The value of ``self`` on the row where ``by`` is minimal
        (ties engine-arbitrary; null ``by`` keys are ignored)."""
        return _fn("arg_min", self, by, partition_by=partition_by,
                   filter=filter)

    def arg_max(self, by, *, partition_by=None, filter=None):
        """The value of ``self`` on the row where ``by`` is maximal."""
        return _fn("arg_max", self, by, partition_by=partition_by,
                   filter=filter)

    def mean(self, *, partition_by=None, filter=None):
        return _fn("mean", self, partition_by=partition_by, filter=filter)

    def sum(self, *, partition_by=None, filter=None):
        return _fn("sum", self, partition_by=partition_by, filter=filter)

    def any(self, *, partition_by=None, filter=None):
        return _fn("any", self, partition_by=partition_by, filter=filter)

    def all(self, *, partition_by=None, filter=None):
        return _fn("all", self, partition_by=partition_by, filter=filter)

    def count(self, *, partition_by=None, filter=None):
        return _fn("count", self, partition_by=partition_by, filter=filter)

    def var(self, *, partition_by=None, filter=None):
        return _fn("var", self, partition_by=partition_by, filter=filter)

    def std(self, *, partition_by=None, filter=None):
        return _fn("std", self, partition_by=partition_by, filter=filter)

    def median(self, *, partition_by=None, filter=None):
        return _fn("median", self, partition_by=partition_by, filter=filter)

    def approx_n_distinct(self, *, partition_by=None, filter=None):
        return _fn("approx_n_distinct", self, partition_by=partition_by,
                   filter=filter)

    def approx_quantile(self, q: float, *, partition_by=None, filter=None):
        return _fn("approx_quantile", self, LiteralCol(q, const=True),
                   partition_by=partition_by, filter=filter)

    def n_distinct(self, *, partition_by=None, filter=None):
        return _fn("n_distinct", self, partition_by=partition_by, filter=filter)

    # ---- window-only ----------------------------------------------------
    def shift(self, n: int, fill_value=None, *, partition_by=None, arrange=None):
        return _fn(
            "shift",
            self,
            LiteralCol(n, const=True),
            fill_value,
            partition_by=partition_by,
            arrange=arrange,
        )

    def rank(self, *, partition_by=None, arrange=None):
        # marker-method form: `t.a.nulls_first().rank()` — the marker was
        # already absorbed into this expression as an Order via dedicated
        # marker methods below.
        return _fn("rank", arrange=arrange if arrange is not None else [self],
                   partition_by=partition_by)

    def dense_rank(self, *, partition_by=None, arrange=None):
        return _fn(
            "dense_rank",
            arrange=arrange if arrange is not None else [self],
            partition_by=partition_by,
        )

    def first(self, *, partition_by=None, arrange=None, filter=None):
        """Value on the first row of the ``arrange=`` order (ordered
        aggregate, extension op; nulls are kept, polars semantics)."""
        return _fn("first", self, partition_by=partition_by,
                   arrange=arrange, filter=filter)

    def last(self, *, partition_by=None, arrange=None, filter=None):
        """Value on the last row of the ``arrange=`` order."""
        return _fn("last", self, partition_by=partition_by,
                   arrange=arrange, filter=filter)

    def cum_sum(self, *, partition_by=None, arrange=None):
        return _fn("cum_sum", self, partition_by=partition_by, arrange=arrange)

    def cum_max(self, *, partition_by=None, arrange=None):
        """Running maximum over the ordered partition (extension op)."""
        return _fn("cum_max", self, partition_by=partition_by, arrange=arrange)

    def cum_min(self, *, partition_by=None, arrange=None):
        """Running minimum over the ordered partition (extension op)."""
        return _fn("cum_min", self, partition_by=partition_by, arrange=arrange)

    # ---- ordering markers ------------------------------------------------
    def ascending(self):
        return Order(self, descending=False)

    def descending(self):
        return Order(self, descending=True)

    def nulls_first(self):
        return Order(self, nulls_last=False)

    def nulls_last(self):
        return Order(self, nulls_last=True)

    # ---- conditional / misc ----------------------------------------------
    def map(self, mapping: dict, *, default=None):
        cases = []
        for keys, val in mapping.items():
            if not isinstance(keys, tuple):
                keys = (keys,)
            cases.append((self.is_in(*keys), wrap_literal(val)))
        return CaseExpr(cases, wrap_literal(default))

    def cast(self, target: tp.Dtype, *, strict: bool = True):
        if isinstance(target, type):
            target = target()
        return Cast(self, target, strict=strict)

    # ---- namespaces ---------------------------------------------------
    @property
    def str(self):
        return StrNamespace(self)

    @property
    def dt(self):
        return DtNamespace(self)

    @property
    def dur(self):
        return DurNamespace(self)

    @property
    def list(self):
        return ListNamespace(self)

    def __bool__(self):
        raise TypeError(
            "a ColExpr has no truth value; use `&`, `|`, `~` for boolean logic"
        )


class Col(ColExpr):
    """Reference to a concrete column — identity by UUID, not name.

    Mirrors reference tree/col_expr.py:2303 — names are display only;
    the UUID survives renames, selects (hidden columns), and joins.
    ``_origin`` is the Table snapshot the reference was taken from
    (``t.a`` sets it to ``t``) — used by ``eval_aligned`` to know which
    relation provides the column's values positionally.
    """

    __slots__ = ("name", "uuid", "table_name", "_origin")

    def __init__(self, name: str, uuid: _uuid.UUID, dtype: tp.Dtype, table_name: str,
                 origin=None):
        super().__init__()
        self.name = name
        self.uuid = uuid
        self._dtype = dtype
        self.table_name = table_name
        self._origin = origin

    def __repr__(self):
        return f"{self.table_name}.{self.name}<{self._dtype!r}>"

    def __hash__(self):
        return hash(self.uuid)


class ColName(ColExpr):
    """Late-bound column reference ``C.x`` — resolved against the table
    it is used on (reference tree/col_expr.py:2318)."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        super().__init__()
        self.name = name

    def __repr__(self):
        return f"C.{self.name}"


class LiteralCol(ColExpr):
    __slots__ = ("val", "const", "explicit_dtype")

    def __init__(self, val, dtype: tp.Dtype | None = None, const: bool = False):
        super().__init__()
        self.val = val
        self._dtype = dtype or tp.infer_literal_type(val)
        # an explicitly requested dtype must also be applied physically
        # (compile casts the literal), not only in the logical type
        self.explicit_dtype = dtype is not None
        self.const = const

    def __repr__(self):
        return f"lit({self.val!r})"


class SeriesCol(ColExpr):
    """A raw in-memory sequence (pandas/polars Series, numpy array) used
    positionally inside ``eval_aligned`` (reference tree/col_expr.py:2771).
    Only valid under an ``EvalAligned`` wrapper."""

    __slots__ = ("values",)

    def __init__(self, values):
        super().__init__()
        self.values = list(values)
        self._dtype = None
        for v in self.values:
            if v is not None and v == v:  # skip None/NaN for inference
                self._dtype = tp.infer_literal_type(v)
                break
        if self._dtype is None:
            self._dtype = tp.NullType()
        self._ftype = FTYPE_ELEMENT_WISE

    def __repr__(self):
        return f"series<{len(self.values)} values>"


class EvalAligned(ColExpr):
    """Positional-alignment escape hatch (reference pipe/aligned.py:15-137,
    node tree/col_expr.py:2783): evaluates an expression whose columns come
    from a DIFFERENT table (or raw Series) by zipping rows positionally
    with the target table."""

    __slots__ = ("val", "with_")

    def __init__(self, val, with_=None):
        super().__init__()
        self.val = _to_aligned_expr(val)
        self.with_ = with_
        self._dtype = self.val._dtype
        self._ftype = FTYPE_ELEMENT_WISE

    def iter_children(self):
        yield self.val

    def __repr__(self):
        return f"eval_aligned({self.val!r})"


def _to_aligned_expr(val):
    if isinstance(val, ColExpr):
        return val
    # duck-typed pandas / polars Series / numpy arrays
    if hasattr(val, "to_list"):
        return SeriesCol(val.to_list())
    if hasattr(val, "tolist"):
        return SeriesCol(val.tolist())
    if isinstance(val, (list, tuple)):
        return SeriesCol(val)
    raise TypeError(
        f"eval_aligned takes a column expression or a Series, got {val!r}"
    )


class ColFn(ColExpr):
    """Operator application with optional context kwargs
    partition_by / arrange / filter (reference tree/col_expr.py:2358)."""

    __slots__ = ("op", "args", "partition_by", "arrange", "filter")

    def __init__(self, op: str, *args: ColExpr, partition_by=None, arrange=None,
                 filter=None):
        super().__init__()
        self.op = op
        self.args = [wrap_literal(a) for a in args]
        self.partition_by = _normalize_list(partition_by, wrap=True)
        self.arrange = (
            [Order.from_expr(o) for o in _normalize_list(arrange)]
            if arrange is not None
            else None
        )
        self.filter = _normalize_filter(filter)

    def iter_children(self):
        yield from self.args
        if self.partition_by:
            yield from self.partition_by
        if self.arrange:
            for o in self.arrange:
                yield o.expr
        if self.filter is not None:
            yield self.filter

    def __repr__(self):
        return f"{self.op}({', '.join(map(repr, self.args))})"


class WhenClause:
    __slots__ = ("cases", "cond")

    def __init__(self, cases, cond):
        self.cases = cases
        self.cond = cond

    def then(self, value) -> "CaseExpr":
        return CaseExpr([*self.cases, (self.cond, wrap_literal(value))])


class CaseExpr(ColExpr):
    __slots__ = ("cases", "default")

    def __init__(self, cases, default: ColExpr | None = None):
        super().__init__()
        self.cases = list(cases)
        self.default = default

    def when(self, cond) -> WhenClause:
        return WhenClause(self.cases, wrap_literal(cond))

    def otherwise(self, value) -> "CaseExpr":
        return CaseExpr(self.cases, wrap_literal(value))

    def iter_children(self):
        for cond, val in self.cases:
            yield cond
            yield val
        if self.default is not None:
            yield self.default

    def __repr__(self):
        return f"case({self.cases!r}, default={self.default!r})"


class Cast(ColExpr):
    __slots__ = ("expr", "target", "strict")

    def __init__(self, expr: ColExpr, target: tp.Dtype, strict: bool = True):
        super().__init__()
        self.expr = expr
        self.target = target
        self.strict = strict
        self._dtype = target

    def iter_children(self):
        yield self.expr


class Order:
    """Sort key + direction + null placement
    (reference tree/col_expr.py:2818).

    Data fields are ``desc`` / ``nl`` so the user-facing marker methods
    (``descending()``, ``nulls_last()`` …) can compose:
    ``t.a.descending().nulls_last()``.
    """

    __slots__ = ("expr", "desc", "nl")

    def __init__(self, expr: ColExpr, descending: bool = False,
                 nulls_last: bool | None = None):
        self.expr = wrap_literal(expr)
        self.desc = descending
        self.nl = nulls_last

    # markers compose: t.a.descending().nulls_last()
    def descending(self):
        return Order(self.expr, True, self.nl)

    def ascending(self):
        return Order(self.expr, False, self.nl)

    def nulls_first(self):
        return Order(self.expr, self.desc, False)

    def nulls_last(self):
        return Order(self.expr, self.desc, True)

    # window ops reachable from a marked column: t.a.nulls_first().rank()
    def rank(self, **kw):
        return ColFn("rank", arrange=[self], **kw)

    def dense_rank(self, **kw):
        return ColFn("dense_rank", arrange=[self], **kw)

    @staticmethod
    def from_expr(e) -> "Order":
        if isinstance(e, Order):
            return e
        return Order(wrap_literal(e))

    def __repr__(self):
        return f"Order({self.expr!r}, desc={self.desc}, nulls_last={self.nl})"


def _normalize_list(v, wrap: bool = False):
    if v is None:
        return None
    if not isinstance(v, (list, tuple)):
        v = [v]
    if wrap:
        return [wrap_literal(x) for x in v]
    return list(v)


def _normalize_filter(f):
    if f is None:
        return None
    if isinstance(f, (list, tuple)):
        out = wrap_literal(f[0])
        for p in f[1:]:
            out = out & wrap_literal(p)
        return out
    return wrap_literal(f)


# --------------------------------------------------------------------------
# namespaces
# --------------------------------------------------------------------------

class StrNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: ColExpr):
        self._e = e

    def strip(self):
        return _fn("str_strip", self._e)

    def upper(self):
        return _fn("str_upper", self._e)

    def lower(self):
        return _fn("str_lower", self._e)

    def len(self):
        return _fn("str_len", self._e)

    def replace_all(self, substr: str, replacement: str):
        return _fn(
            "str_replace_all",
            self._e,
            LiteralCol(substr, const=True),
            LiteralCol(replacement, const=True),
        )

    def starts_with(self, prefix):
        return _fn("str_starts_with", self._e, prefix)

    def ends_with(self, suffix):
        return _fn("str_ends_with", self._e, suffix)

    def contains(self, pattern: str, *, allow_regex: bool = True,
                 true_if_regex_unsupported: bool = False):
        return _fn(
            "str_contains",
            self._e,
            LiteralCol(pattern, const=True),
            LiteralCol(bool(allow_regex), const=True),
        )

    def slice(self, offset, n):
        return _fn("str_slice", self._e, offset, n)

    def to_datetime(self):
        return _fn("str_to_datetime", self._e)

    def to_date(self):
        return _fn("str_to_date", self._e)

    def join(self, delimiter: str = "", *, partition_by=None, arrange=None,
             filter=None):
        return _fn(
            "str_join",
            self._e,
            LiteralCol(delimiter, const=True),
            partition_by=partition_by,
            arrange=arrange,
            filter=filter,
        )

    # --- beyond-reference helpers used by the text-analysis extras ------
    def split(self, pattern: str):
        return _fn("str_split", self._e, LiteralCol(pattern, const=True))


class DtNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: ColExpr):
        self._e = e

    def year(self):
        return _fn("dt_year", self._e)

    def month(self):
        return _fn("dt_month", self._e)

    def day(self):
        return _fn("dt_day", self._e)

    def hour(self):
        return _fn("dt_hour", self._e)

    def minute(self):
        return _fn("dt_minute", self._e)

    def second(self):
        return _fn("dt_second", self._e)

    def millisecond(self):
        return _fn("dt_millisecond", self._e)

    def microsecond(self):
        return _fn("dt_microsecond", self._e)

    def day_of_week(self):
        return _fn("dt_day_of_week", self._e)

    def day_of_year(self):
        return _fn("dt_day_of_year", self._e)


class DurNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: ColExpr):
        self._e = e

    def days(self):
        return _fn("dur_days", self._e)

    def hours(self):
        return _fn("dur_hours", self._e)

    def minutes(self):
        return _fn("dur_minutes", self._e)

    def seconds(self):
        return _fn("dur_seconds", self._e)

    def milliseconds(self):
        return _fn("dur_milliseconds", self._e)

    def microseconds(self):
        return _fn("dur_microseconds", self._e)


class ListNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: ColExpr):
        self._e = e

    def agg(self, *, partition_by=None, arrange=None, filter=None):
        return _fn(
            "list_agg",
            self._e,
            partition_by=partition_by,
            arrange=arrange,
            filter=filter,
        )

    # element-wise list ops (extensions; the reference has no list
    # namespace beyond agg — these make array columns reducible to
    # scalars, e.g. after str.split)
    def len(self):
        return _fn("list_len", self._e)

    def get(self, index: int):
        return _fn("list_get", self._e, LiteralCol(index, const=True))

    def contains(self, value):
        return _fn("list_contains", self._e, wrap_literal(value))

    def join(self, sep: str = ""):
        return _fn("list_join", self._e, LiteralCol(sep, const=True))


class CMeta(type):
    def __getattr__(cls, name: str) -> ColName:
        return ColName(name)

    def __getitem__(cls, name: str) -> ColName:
        return ColName(name)


class C(metaclass=CMeta):
    """Late-bound column accessor: ``C.x`` / ``C["x"]``
    (reference pipe/c.py:7-20)."""
