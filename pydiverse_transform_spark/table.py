"""The Table wrapper: a lazy logical relation over a PySpark DataFrame.

Design (SURVEY §1.3 "Spark mapping"): the wrapped DataFrame *is* the
logical plan — verbs apply DataFrame transformations immediately (still
lazy w.r.t. execution; Catalyst optimizes the composed plan).  On top we
keep the reference's UUID column-identity model
(reference pipe/table.py:23, pipe/cache.py:18-31):

- every in-scope column has a UUID; the physical DataFrame's columns are
  named ``c_<uuid.hex>`` so user renames / hidden columns / joins can
  never collide physically;
- ``_select`` is the ordered list of *visible* column UUIDs; deselected
  or overwritten columns stay physically present ("hidden") and remain
  usable through previously captured ``t.col`` references;
- ``_partition_by`` is the ambient grouping (group_by/ungroup verbs);
- ``_order`` remembers the last arrange so order-dependent window ops
  and slice_head have a deterministic default ordering.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame

from . import types as tp
from .plans.compile import Scope, phys
from .plans.expr import Col, ColExpr, ColName, Order

__all__ = ["Table"]


class Table:
    __slots__ = ("_df", "_cols", "_select", "_partition_by", "_order",
                 "_name", "_lineage_ids")

    def __init__(self, df, name: str | None = None, *,
                 _dtype_overrides: dict | None = None):
        overrides: dict[str, tp.Dtype] = dict(_dtype_overrides or {})
        if not isinstance(df, DataFrame):
            # direct construction from dict / pandas / polars, like the
            # reference's Table(...) (reference pipe/table.py:31-37);
            # needs an active SparkSession.  Time-of-day columns
            # (datetime.time values / polars Time) have no Spark type;
            # they land as µs-since-midnight longs with a dtype
            # override so the LOGICAL type stays Time (types.Time)
            df, ov2 = _to_spark_df(df)
            overrides.update(ov2)
        self._name = name or "?"
        cols: dict[_uuid.UUID, Col] = {}
        select: list[_uuid.UUID] = []
        exprs = []
        for field in df.schema.fields:
            u = _uuid.uuid4()
            cols[u] = Col(
                field.name, u,
                overrides.get(field.name,
                              tp.from_spark_type(field.dataType)),
                self._name,
            )
            select.append(u)
            exprs.append(df[field.name].alias(phys(u)))
        self._df = df.select(*exprs)
        self._cols = cols
        self._select = select
        self._partition_by: list[_uuid.UUID] = []
        self._order: list[Order] = []

    # -- construction of derived tables (used by verbs) --------------------
    @classmethod
    def _derived(cls, df, cols, select, partition_by, order, name) -> "Table":
        t = object.__new__(cls)
        t._df = df
        t._cols = cols
        t._select = select
        t._partition_by = partition_by
        t._order = order
        t._name = name
        return t

    def _scope(self) -> Scope:
        return Scope(self._cols, self._name2uuid(), self._partition_by)

    def _name2uuid(self) -> dict[str, _uuid.UUID]:
        return {self._cols[u].name: u for u in self._select}

    # -- user surface -------------------------------------------------------
    def __getattr__(self, name: str) -> Col:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    def __getitem__(self, name: str) -> Col:
        n2u = self._name2uuid()
        if name not in n2u:
            from .errors import ColumnNotFoundError

            raise ColumnNotFoundError(
                f"table `{self._name}` has no column `{name}`; "
                f"columns: {list(n2u)}"
            )
        c = self._cols[n2u[name]]
        # stamp the reference with THIS table snapshot so eval_aligned
        # knows which relation provides the values positionally
        return Col(c.name, c.uuid, c._dtype, c.table_name, origin=self)

    def __rshift__(self, rhs):
        if callable(rhs):
            return rhs(self)
        return NotImplemented

    def __contains__(self, col) -> bool:
        if isinstance(col, Col):
            return col.uuid in self._cols
        return col in self._name2uuid()

    def __iter__(self):
        """Iterate the visible columns as Col references, in select
        order — enables ``for col in t`` / ``mutate(**{c.name: ... for
        c in t})`` (reference pipe/table.py ``__iter__``; used
        throughout reference tests, e.g. test_cast.py:30-38)."""
        return iter([self[self._cols[u].name] for u in self._select])

    @property
    def columns(self) -> list[str]:
        return [self._cols[u].name for u in self._select]

    @property
    def dtypes(self) -> dict[str, tp.Dtype]:
        return {self._cols[u].name: self._cols[u]._dtype for u in self._select}

    @property
    def name(self) -> str:
        return self._name

    def __repr__(self):
        cols = ", ".join(
            f"{self._cols[u].name}: {self._cols[u]._dtype!r}"
            for u in self._select
        )
        return f"Table({self._name}, [{cols}])"

    def __str__(self):
        """Schema plus a data preview (reference pipe/table.py:243-295
        prints the backend frame; failures render as 'failed to execute
        query' rather than raising — prints must never crash a REPL)."""
        try:
            n = self._df.count()
            pdf = (
                self.to_spark().limit(20).toPandas()
            )
            head = (
                f"Table `{self._name}` (backend: spark), "
                f"shape: ({n}, {len(self._select)})"
            )
            body = pdf.to_string(index=False)
            more = f"\n... ({n - 20} more rows)" if n > 20 else ""
            return f"{head}\n{body}{more}"
        except Exception as e:  # pragma: no cover - defensive
            return f"{self.__repr__()}\nfailed to execute query: {e}"

    def _repr_html_(self) -> str:
        try:
            pdf = self.to_spark().limit(20).toPandas()
            return (
                f"Table <code>{self._name}</code> "
                f"(backend: <code>spark</code>)<br/>"
                + pdf.to_html(index=False)
            )
        except Exception as e:  # pragma: no cover - defensive
            return f"<pre>failed to execute query: {e}</pre>"

    # -- resolution helper used by verbs -------------------------------------
    def _resolve_uuid(self, c) -> _uuid.UUID:
        """Accept a Col, ColName, or plain string and return its UUID."""
        if isinstance(c, Col):
            if c.uuid not in self._cols:
                raise ValueError(f"column {c!r} not in scope of `{self._name}`")
            return c.uuid
        if isinstance(c, ColName):
            return self._resolve_uuid(c.name)
        if isinstance(c, str):
            n2u = self._name2uuid()
            if c not in n2u:
                raise KeyError(
                    f"table `{self._name}` has no visible column `{c}`"
                )
            return n2u[c]
        raise TypeError(f"expected a column reference, got {c!r}")

    # convenience: the underlying Spark DataFrame with display names
    def to_spark(self) -> DataFrame:
        from pyspark.sql import functions as F

        return self._df.select(
            *[F.col(phys(u)).alias(self._cols[u].name) for u in self._select]
        )


def _to_spark_df(data, spark=None):
    """(spark DataFrame, {col: logical-dtype overrides}) for dict /
    pandas / polars input; time-of-day columns convert to µs longs with
    a types.Time override."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "Table(dict/pandas/polars) needs an active SparkSession; "
            "create one first or use sources.read_* / from_* helpers"
        )
    if isinstance(data, dict):
        # row-based (not via pandas) so None stays a true null in float
        # columns
        cols = list(data)
        data, overrides = _convert_time_cols_dict(data, cols)
        rows = list(zip(*[data[c] for c in cols])) if cols else []
        return spark.createDataFrame(rows, schema=cols), overrides
    try:
        import polars as pl

        if isinstance(data, pl.DataFrame):
            # pl.Time is i64 NANOseconds since midnight; Spark has no
            # TIME type, so convert to the engine's µs representation
            # and keep the logical dtype via an override
            tcols = [c for c, d in zip(data.columns, data.dtypes)
                     if d == pl.Time]
            if tcols:
                data = data.with_columns(
                    *[(pl.col(c).cast(pl.Int64) // 1000).alias(c)
                      for c in tcols])
            return (spark.createDataFrame(data.to_pandas()),
                    {c: tp.Time() for c in tcols})
    except ImportError:
        pass
    if hasattr(data, "to_pandas"):  # polars-like without polars module
        return spark.createDataFrame(data.to_pandas()), {}
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            import datetime as _dt

            # only OBJECT columns can hold datetime.time; convert those
            # whose non-null values are all times (NaN -> None first)
            tcols = {}
            for c in data.columns:
                if data[c].dtype != object:
                    continue
                vals = [None if (v is None or v is pd.NaT
                                 or (isinstance(v, float) and pd.isna(v)))
                        else v for v in data[c]]
                if any(isinstance(v, _dt.time) for v in vals):
                    tcols[c] = vals
            if not tcols:
                return spark.createDataFrame(data), {}
            d, overrides = _convert_time_cols_dict(tcols, list(tcols))
            data = data.copy()
            for c in overrides:
                # object column of python ints/None -> LongType with
                # true nulls (nullable Int64 would land as double/NaN)
                data[c] = pd.Series(d[c], dtype=object, index=data.index)
            return spark.createDataFrame(data), overrides
    except ImportError:
        pass
    raise TypeError(
        f"cannot construct a Table from {type(data).__name__}; expected a "
        "pyspark DataFrame, dict, pandas or polars DataFrame"
    )


def _convert_time_cols_dict(data: dict, cols) -> tuple[dict, dict]:
    """Replace datetime.time values with µs-since-midnight ints; return
    (converted data, {col: Time()} overrides).  Mixed time/non-time
    columns raise (a silent long would corrupt the logical type)."""
    import datetime as _dt

    overrides: dict[str, tp.Dtype] = {}
    out = dict(data)
    for c in cols:
        vals = list(data[c])
        if not any(isinstance(v, _dt.time) for v in vals):
            continue
        if not all(v is None or isinstance(v, _dt.time) for v in vals):
            raise TypeError(
                f"column {c!r} mixes datetime.time with other types")
        if any(v is not None and v.tzinfo is not None for v in vals):
            raise TypeError(
                f"column {c!r}: time values must be naive (no tzinfo)")
        out[c] = [
            None if v is None else
            ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000
            + v.microsecond
            for v in vals]
        overrides[c] = tp.Time()
    return out, overrides
