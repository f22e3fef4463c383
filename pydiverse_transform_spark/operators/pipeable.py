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


def verb(fn):
    """Turn ``fn(table, *args, **kwargs)`` into a pipe verb usable as
    ``table >> fn(*args, **kwargs)`` (also callable directly)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return Pipeable(lambda table: fn(table, *args, **kwargs))

    wrapper.__wrapped_verb__ = fn
    return wrapper


def inverse_partial(fn, *args, **kwargs):
    return Pipeable(lambda table: fn(table, *args, **kwargs))
