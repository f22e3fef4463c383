"""Export targets (reference pipe/verbs.py:252-347 target dispatch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .plans.compile import phys

__all__ = ["Pandas", "Polars", "Arrow", "Dict", "DictOfLists", "ListOfRows",
           "ListOfDicts", "Scalar", "Spark", "DuckDb", "DuckDbRelation",
           "SqlAlchemy",
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
    """Export into an in-process DuckDB relation
    (reference backend/targets.py:22, where ``DuckDb`` selects DuckDB as
    the engine for subsequent operations after ``collect``).

    On this engine the pipeline itself always executes on Spark;
    ``export(DuckDb())`` materializes the result via Arrow (zero-copy
    into DuckDB) and returns a ``duckdb.DuckDBPyRelation``, so a
    migrating user lands in DuckDB-land with the full duckdb relational
    / SQL API available downstream — the same hand-off point the
    reference's ``collect(DuckDb())`` provides.

    ``connection=`` reuses a caller's ``duckdb.DuckDBPyConnection`` (the
    result is also registered there under ``relation_name``, default the
    table's name, for ``con.sql(...)`` access) and the raw
    ``DuckDBPyRelation`` is returned; without it a fresh in-memory
    connection is created, and because a DuckDBPyRelation does NOT keep
    its connection alive, the return value is a ``DuckDbRelation`` proxy
    that owns the private connection and delegates every relation
    method/operator (``.connection`` / ``.relation`` expose the parts)."""

    def __init__(self, connection=None, *, relation_name: str | None = None):
        self.connection = connection
        self.relation_name = relation_name


class DuckDbRelation:
    """A duckdb.DuckDBPyRelation plus the private in-memory connection
    backing it (which would otherwise be garbage-collected out from
    under the relation).  Transparently delegates to the relation."""

    __slots__ = ("connection", "relation")

    def __init__(self, connection, relation):
        self.connection = connection
        self.relation = relation

    def __getattr__(self, item):
        return getattr(self.relation, item)

    def __repr__(self):
        return repr(self.relation)

    def __str__(self):
        return str(self.relation)

    def __len__(self):
        return self.relation.shape[0]

    # Python resolves special methods on the type, never through
    # __getattr__, so the protocols the docstring promises must be
    # forwarded explicitly.
    def __getitem__(self, item):
        return self.relation[item]

    def __iter__(self):
        return iter(self.relation.fetchall())

    def __contains__(self, item):
        return item in self.relation.columns


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
    if isinstance(target, DuckDb):
        import re

        import duckdb

        private = target.connection is None
        con = target.connection or duckdb.connect()
        tbl = df.toArrow()
        if target.relation_name is not None:
            # a caller-supplied name is used verbatim: reject rather
            # than silently rewrite, and never clobber an existing view
            # on a caller's connection
            name = target.relation_name
            if re.search(r"\W", name) or not name:
                raise ValueError(
                    f"relation_name {name!r} is not a plain identifier "
                    "([A-Za-z0-9_]+); pass a valid name instead"
                )
            if not private:
                existing = con.sql(
                    "SELECT 1 FROM duckdb_views() WHERE view_name = ?"
                    " LIMIT 1",
                    params=[name],
                ).fetchone()
                if existing:
                    raise ValueError(
                        f"relation_name {name!r} already names a view on "
                        "the supplied connection; choose another name or "
                        "unregister it first"
                    )
        else:
            name = getattr(table, "_name", None) or "t"
            # derived default names: keep registerable without quoting games
            name = re.sub(r"\W", "_", name) or "t"
        con.register(name, tbl)
        rel = con.sql(f'SELECT * FROM "{name}"')
        return DuckDbRelation(con, rel) if private else rel
    if isinstance(target, SqlAlchemy):
        raise TypeError(
            "SqlAlchemy is a SQL-backend selector of the reference "
            "engine; this engine executes on Spark. Read SQL sources "
            "with read_jdbc/read_table and write with save_as_table, "
            "write_jdbc, or to_spark().write.jdbc"
        )
    raise TypeError(f"unknown export target {target!r}")
