"""``>>`` pipe plumbing and the ``@verb`` decorator.

Same user surface as the reference (reference pipe/pipeable.py:12-102):
``t >> verb(args)`` applies the verb; ``verb1(a) >> verb2(b)`` composes
into a reusable pipeline; any 1-arg callable also works on the right of
``>>``.
"""

from __future__ import annotations

import functools

__all__ = ["Pipeable", "verb", "inverse_partial"]


class Pipeable:
    __slots__ = ("_fn",)

    def __init__(self, fn):
        self._fn = fn

    def __rrshift__(self, lhs):
        return self._fn(lhs)

    def __rshift__(self, rhs):
        if isinstance(rhs, Pipeable):
            return Pipeable(lambda t: rhs._fn(self._fn(t)))
        if callable(rhs):
            return Pipeable(lambda t: rhs(self._fn(t)))
        return NotImplemented

    def __call__(self, arg):
        return self._fn(arg)


def _is_table(x) -> bool:
    # duck-typed to avoid a circular import with ..table
    return hasattr(x, "_df") and hasattr(x, "_cols")


def _attach_lineage(out, inputs):
    """Record the ancestor tables of a verb result (by object identity)
    so ``ColExpr.uses_table`` can answer "was this table derived from
    the table that column belongs to?" (reference col_expr.py:217-225
    answers it via AST-subtree containment)."""
    if not _is_table(out):
        return out
    ids: set[int] = set()
    for t in inputs:
        if _is_table(t) and t is not out:
            ids.add(id(t))
            ids |= getattr(t, "_lineage_ids", set())
    if ids:
        out._lineage_ids = ids | getattr(out, "_lineage_ids", set())
    return out


def verb(fn):
    """Turn ``fn(table, *args, **kwargs)`` into a pipe verb usable as
    ``table >> fn(*args, **kwargs)`` (also callable directly)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        def run(table):
            out = fn(table, *args, **kwargs)
            return _attach_lineage(
                out, [table, *args, *kwargs.values()]
            )

        return Pipeable(run)

    wrapper.__wrapped_verb__ = fn
    return wrapper


def inverse_partial(fn, *args, **kwargs):
    return Pipeable(lambda table: fn(table, *args, **kwargs))
