"""Typed error classes matching the reference's public error surface
(reference errors.py: ColumnNotFoundError, DataTypeError,
FunctionTypeError, NotSupportedError, SubqueryError).

Each subclasses the builtin it semantically refines, so code written
against either surface (`except pdt.FunctionTypeError` or plain
`except ValueError`) catches the same failures.
"""

from __future__ import annotations

__all__ = [
    "ColumnNotFoundError",
    "DataTypeError",
    "FunctionTypeError",
    "NotSupportedError",
    "SubqueryError",
    "NonStandardWarning",
]


class ColumnNotFoundError(KeyError):
    """A referenced column does not exist in the table's scope."""

    def __str__(self):  # KeyError quotes its arg; keep the message plain
        return self.args[0] if self.args else ""


class DataTypeError(TypeError):
    """An operator was applied to operands of incompatible dtypes."""


class FunctionTypeError(ValueError):
    """An aggregate/window function appears where its function type is
    not allowed (window in filter/summarize/join-on, nested aggregates,
    bare columns in summarize, ...)."""


class NotSupportedError(Exception):
    """The operation is not supported by this backend."""


class NonStandardWarning(UserWarning):
    """Emitted when the Spark backend deviates from the reference's
    standard behaviour (reference errors/__init__.py:47-51) — e.g.
    unsigned ints widening to the next signed type, or Time being
    carried as µs-since-midnight.  Filterable via the standard
    ``warnings`` machinery."""


class SubqueryError(Exception):
    """Unused on Spark — Catalyst composes plans freely, so no verb ever
    requires an explicit subquery boundary.  Exported for API parity so
    ``except pdt.SubqueryError`` imports keep working."""


def warn_non_standard(message: str, stacklevel: int = 1) -> None:
    """Emit a NonStandardWarning (reference util/warnings.py:46-53) at a
    divergence site — e.g. unsigned ints widening to signed, Duration
    carried as µs.  Python's default warning filter dedupes per call
    site, so hot loops don't spam."""
    import warnings

    warnings.warn(message, NonStandardWarning, stacklevel=stacklevel + 1)
