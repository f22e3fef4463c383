"""Export targets (reference pipe/verbs.py:252-347 target dispatch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .plans.compile import phys

__all__ = ["Pandas", "Polars", "Arrow", "Dict", "DictOfLists", "ListOfRows",
           "ListOfDicts", "Scalar", "Spark", "DuckDb", "SqlAlchemy",
           "export_to"]


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


# the reference's name for the row-oriented target
# (reference backend/targets.py:40)
ListOfDicts = ListOfRows


class DuckDb(Target):
    """API-compat shim (reference backend/targets.py:22): this engine
    executes on Spark only.  Accepted by ``collect``/``export`` solely to
    give reference users a typed, actionable error instead of an
    AttributeError."""


class SqlAlchemy(Target):
    """API-compat shim (reference backend/targets.py:25).  For SQL
    sources use ``read_jdbc``/``read_table``; for SQL sinks use
    ``save_as_table`` or ``to_spark().write.jdbc``."""

    def __init__(self, engine=None, *, schema: str | None = None):
        self.engine = engine
        self.schema = schema


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
    if isinstance(target, (DuckDb, SqlAlchemy)):
        raise TypeError(
            f"{type(target).__name__} is a SQL-backend selector of the "
            "reference engine; this engine executes on Spark. Read SQL "
            "sources with read_jdbc/read_table and write with "
            "save_as_table or to_spark().write.jdbc"
        )
    raise TypeError(f"unknown export target {target!r}")
