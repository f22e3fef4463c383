"""Positional alignment: ``eval_aligned`` / ``@aligned``
(reference pipe/aligned.py:15-137, node tree/col_expr.py:2783).

The reference evaluates expressions mixing columns of different
equal-length tables (or raw pandas/polars Series) by ROW POSITION.  Spark
DataFrames have no intrinsic row order, so alignment here is defined
w.r.t. the current physical order of each relation (deterministic for
freshly-scanned or freshly-constructed data): each side gets a positional
index (``row_number`` over ``monotonically_increasing_id``) and the sides
are equi-joined on it.

Scale note: the unpartitioned row_number window funnels each relation
through ONE reducer — this is inherently not a 100-TB operator.  It is
the reference's small-data escape hatch (polars Series interop) and is
provided for API parity; large-scale positional joins should carry an
explicit key column instead.  A runtime assertion fails the job when the
aligned relations have different lengths (matching the reference's
length check).
"""

from __future__ import annotations

import functools
import inspect
import uuid as _uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.compile import CompileCtx, Scope, compile_expr, phys, prepare
from ..plans.expr import CaseExpr, Cast, Col, ColExpr, ColFn, EvalAligned, \
    Order, SeriesCol
from ..table import Table

__all__ = ["eval_aligned", "aligned", "apply_aligned"]


def eval_aligned(val, with_=None) -> EvalAligned:
    """Wrap an expression (or pandas/polars Series) for positional
    evaluation inside ``mutate`` (reference pipe/aligned.py:77-137).

    ``with_`` names the table/column to align with; in a ``mutate`` the
    target table is unambiguous, so it is accepted for API parity and
    only validated, never needed."""
    return EvalAligned(val, with_)


def aligned(fn=None, *, with_: str | None = None):
    """Decorator applying :func:`eval_aligned` to a function's return
    value (reference pipe/aligned.py:15-74)."""

    def decorator(fn):
        signature = inspect.signature(fn)
        if with_ is not None and with_ not in signature.parameters:
            raise ValueError(
                f"function `{fn.__name__}` has no argument named `{with_}`"
            )

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if with_ is not None:
                bound = signature.bind(*args, **kwargs)
                bound.apply_defaults()
                with_obj = bound.arguments[with_]
            else:
                with_obj = None
            return eval_aligned(fn(*args, **kwargs), with_=with_obj)

        return wrapper

    if fn is not None:
        return decorator(fn)
    return decorator


def _positional_index():
    # the index reflects the relation's current physical order; single
    # reducer by design (see module docstring)
    return F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))


def apply_aligned(table: Table, df, ea: EvalAligned, out_phys: str):
    """Attach the aligned expression's value as physical column
    ``out_phys`` on ``df`` (the target table's DataFrame mid-mutate).
    Returns (new_df, result_dtype)."""
    expr = ea.val

    # collect foreign column sources and raw series
    foreign_tables: dict[int, Table] = {}
    foreign_cols: dict[int, list[Col]] = {}
    series: list[SeriesCol] = []

    def walk(e: ColExpr):
        if isinstance(e, Col) and e.uuid not in table._cols:
            if e._origin is None:
                raise ValueError(
                    f"eval_aligned: column {e!r} does not belong to the "
                    "target table and carries no origin; take the "
                    "reference via `other_table.col`"
                )
            key = id(e._origin)
            foreign_tables[key] = e._origin
            foreign_cols.setdefault(key, []).append(e)
        if isinstance(e, SeriesCol):
            series.append(e)
        for c in e.iter_children():
            walk(c)

    walk(expr)

    idx = "__align_idx"
    target = df.withColumn(idx, _positional_index()) \
        .withColumn("__align_t", F.lit(1))
    joined = target
    markers = ["__align_t"]

    spark = df.sparkSession
    for i, (key, src) in enumerate(foreign_tables.items()):
        need = {c.uuid for c in foreign_cols[key]}
        src_df = src._df.withColumn(idx, _positional_index()).select(
            idx, *[phys(u) for u in need]
        ).withColumn(f"__align_s{i}", F.lit(1))
        joined = joined.join(src_df, on=idx, how="full")
        markers.append(f"__align_s{i}")

    series_repl: dict[int, Col] = {}
    for j, s in enumerate(series):
        c = Col(f"__series_{j}", _uuid.uuid4(), s._dtype, "series")
        series_repl[id(s)] = c
        rows = [(i + 1, v) for i, v in enumerate(s.values)]
        s_df = spark.createDataFrame(
            rows, schema=[idx, "v"]
        ).select(
            F.col(idx),
            F.col("v").alias(phys(c.uuid)),
            F.lit(1).alias(f"__align_x{j}"),
        )
        joined = joined.join(s_df, on=idx, how="full")
        markers.append(f"__align_x{j}")

    expr2 = _replace_series(expr, series_repl)

    scope_cols = dict(table._cols)
    for cs in foreign_cols.values():
        for c in cs:
            scope_cols[c.uuid] = c
    for c in series_repl.values():
        scope_cols[c.uuid] = c
    scope = Scope(scope_cols, table._name2uuid(), list(table._partition_by))
    prepared = prepare(expr2, scope, "mutate")
    ctx = CompileCtx(default_order=table._order)
    value = compile_expr(prepared, ctx)

    # length mismatch fails the job (reference raises eagerly)
    present = functools.reduce(
        lambda a, b: a & b, [F.col(m).isNotNull() for m in markers]
    )
    check = F.assert_true(
        present, F.lit("eval_aligned: relations have different lengths")
    )
    out = joined.withColumn(out_phys, F.when(check.isNull(), value))
    out = out.drop(idx, *markers,
                   *[phys(c.uuid)
                     for cs in foreign_cols.values() for c in cs],
                   *[phys(c.uuid) for c in series_repl.values()])
    return out, prepared._dtype


def _replace_series(e: ColExpr, repl: dict[int, Col]) -> ColExpr:
    if isinstance(e, SeriesCol):
        return repl[id(e)]
    if isinstance(e, (Col,)) or not list(e.iter_children()):
        return e
    if isinstance(e, Cast):
        return Cast(_replace_series(e.expr, repl), e.target, e.strict)
    if isinstance(e, CaseExpr):
        return CaseExpr(
            [
                (_replace_series(c, repl), _replace_series(v, repl))
                for c, v in e.cases
            ],
            _replace_series(e.default, repl) if e.default is not None else None,
        )
    if isinstance(e, ColFn):
        out = ColFn.__new__(ColFn)
        ColExpr.__init__(out)
        out.op = e.op
        out.args = [_replace_series(a, repl) for a in e.args]
        out.partition_by = (
            [_replace_series(p, repl) for p in e.partition_by]
            if e.partition_by is not None else None
        )
        out.arrange = (
            [Order(_replace_series(o.expr, repl), o.desc, o.nl)
             for o in e.arrange]
            if e.arrange is not None else None
        )
        out.filter = (
            _replace_series(e.filter, repl) if e.filter is not None else None
        )
        return out
    return e
