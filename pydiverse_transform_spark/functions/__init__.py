"""Free functions of the DSL (reference pipe/functions.py)."""

from __future__ import annotations

from .. import types as tp
from ..plans.expr import (
    CaseExpr,
    ColFn,
    LiteralCol,
    WhenClause,
    wrap_literal,
)

__all__ = [
    "when", "lit", "count", "row_number", "rank", "dense_rank", "rand",
    "min", "max", "sum", "any", "all", "coalesce",
]


def when(condition) -> WhenClause:
    """``when(cond).then(v).when(...).otherwise(d)``
    (reference pipe/functions.py:35-40)."""
    return WhenClause([], wrap_literal(condition))


def lit(value, dtype: tp.Dtype | None = None) -> LiteralCol:
    """Typed literal (reference pipe/functions.py:43-63)."""
    if isinstance(dtype, type):
        dtype = dtype()
    return LiteralCol(value, dtype)


def count(col=None, *, partition_by=None, filter=None) -> ColFn:
    """``count()`` = count(*); ``count(col)`` = non-null count
    (reference ops/ops/aggregation.py:84-92)."""
    args = () if col is None else (wrap_literal(col),)
    return ColFn("count", *args, partition_by=partition_by, filter=filter)


def row_number(*, arrange, partition_by=None) -> ColFn:
    return ColFn("row_number", arrange=arrange, partition_by=partition_by)


def rank(*, arrange, partition_by=None) -> ColFn:
    return ColFn("rank", arrange=arrange, partition_by=partition_by)


def dense_rank(*, arrange, partition_by=None) -> ColFn:
    return ColFn("dense_rank", arrange=arrange, partition_by=partition_by)


def percent_rank(*, arrange, partition_by=None) -> ColFn:
    """(rank - 1) / (rows in partition - 1), in [0, 1] — the exact
    quantile position, for percentile-based filtering."""
    return ColFn("percent_rank", arrange=arrange, partition_by=partition_by)


def ntile(n: int, *, arrange, partition_by=None) -> ColFn:
    """Bucket 1..n by position within the ordered partition."""
    from ..plans.expr import wrap_literal

    return ColFn("ntile", wrap_literal(n), arrange=arrange,
                 partition_by=partition_by)


def rand() -> ColFn:
    return ColFn("rand")


# horizontal (row-wise, null-skipping min/max like SQL LEAST/GREATEST;
# reference ops/ops/horizontal.py)

def min(*cols) -> ColFn:
    return ColFn("h_min", *cols)


def max(*cols) -> ColFn:
    return ColFn("h_max", *cols)


def sum(*cols) -> ColFn:
    return ColFn("h_sum", *cols)


def any(*cols) -> ColFn:
    return ColFn("h_any", *cols)


def all(*cols) -> ColFn:
    return ColFn("h_all", *cols)


def coalesce(*cols) -> ColFn:
    return ColFn("coalesce", *cols)
