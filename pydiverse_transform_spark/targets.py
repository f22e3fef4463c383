"""Export targets (reference pipe/verbs.py:252-347 target dispatch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .plans.compile import phys

__all__ = ["Pandas", "Polars", "Arrow", "Dict", "DictOfLists", "ListOfRows",
           "Scalar", "Spark", "export_to"]


class Target:
    pass


class Pandas(Target):
    pass


class Polars(Target):
    pass


class Arrow(Target):
    pass


class Dict(Target):
    """dict[str, list] — column-oriented."""


DictOfLists = Dict


class ListOfRows(Target):
    """list[dict] — row-oriented."""


class Scalar(Target):
    """Single value: first column of first row (1x1 result expected)."""


class Spark(Target):
    """The underlying pyspark DataFrame with display column names."""


def export_to(table, target):
    if isinstance(target, type):
        target = target()
    df = table.to_spark()
    if isinstance(target, Spark):
        return df
    if isinstance(target, Pandas):
        return df.toPandas()
    if isinstance(target, Arrow):
        return df.toArrow()
    if isinstance(target, Polars):
        import polars as pl

        return pl.from_arrow(df.toArrow())
    if isinstance(target, Dict):
        pdf = df.toPandas()
        return {c: pdf[c].tolist() for c in pdf.columns}
    if isinstance(target, ListOfRows):
        return [r.asDict(recursive=True) for r in df.collect()]
    if isinstance(target, Scalar):
        rows = df.take(2)
        if len(rows) != 1 or len(rows[0]) != 1:
            raise ValueError(
                "Scalar export requires exactly one row and one column"
            )
        return rows[0][0]
    raise TypeError(f"unknown export target {target!r}")
