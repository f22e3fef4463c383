"""Tests for the round-2 API-parity additions: Table() direct
construction, eval_aligned/@aligned, transfer_col_references, ast_repr,
export(schema_overrides=).
"""

import pandas as pd
import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import C


def test_table_direct_construction(spark):
    t = pdt.Table({"a": [1, 2, 5], "b": ["x", "y", "z"]}, name="t")
    out = t >> pdt.filter(t.a >= 2) >> pdt.export(pdt.Pandas)
    assert sorted(out["a"]) == [2, 5]

    t2 = pdt.Table(pd.DataFrame({"a": [1.5, 2.5]}), name="t2")
    assert (t2 >> pdt.export(pdt.Pandas))["a"].tolist() == [1.5, 2.5]


def test_eval_aligned_two_tables(spark):
    t1 = pdt.Table({"a": [1, 2, 3, 4]}, name="t1")
    t2 = pdt.Table({"a": [5, 3, 1, 3]}, name="t2")
    out = (
        t1
        >> pdt.mutate(c=pdt.eval_aligned(t1.a + t2.a, with_=t1))
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out["c"]) == sorted([6, 5, 4, 7])
    # positional: row i of t1 pairs with row i of t2
    by_a = out.sort_values("a")
    assert by_a["c"].tolist() == [6, 5, 4, 7]


def test_eval_aligned_series(spark):
    t = pdt.Table({"a": [1, 2, 3, 4], "b": [2, 5, 16, 3]}, name="t")
    s = pd.Series([9, 5, 4, 1])
    out = (
        t >> pdt.mutate(c=pdt.eval_aligned(t.a + s))
        >> pdt.export(pdt.Pandas)
    )
    assert out.sort_values("a")["c"].tolist() == [10, 7, 7, 5]


def test_eval_aligned_length_mismatch_fails(spark):
    t1 = pdt.Table({"a": [1, 2, 3]}, name="t1")
    t2 = pdt.Table({"a": [1, 2]}, name="t2")
    q = t1 >> pdt.mutate(c=pdt.eval_aligned(t1.a + t2.a))
    with pytest.raises(Exception, match="different lengths"):
        q >> pdt.export(pdt.Pandas)


def test_aligned_decorator(spark):
    t = pdt.Table({"a": [1, 2, 3, 4]}, name="t")

    @pdt.aligned(with_="col")
    def reverse_col(col):
        vals = (
            col._origin
            >> pdt.select(col)
            >> pdt.export(pdt.Pandas)
        )[col.name].tolist()
        return pd.Series(list(reversed(vals)))

    out = t >> pdt.mutate(r=reverse_col(t.a)) >> pdt.export(pdt.Pandas)
    assert out.sort_values("a")["r"].tolist() == [4, 3, 2, 1]


def test_transfer_col_references(spark):
    t = pdt.Table({"a": [1, 2, 5], "b": ["x", "y", "z"]}, name="t")

    @pdt.verb
    def materialize(tbl):
        # simulate external materialization: export + re-read
        pdf = tbl >> pdt.export(pdt.Pandas)
        new = pdt.Table(pdf, name="materialized")
        return pdt.transfer_col_references(new, tbl)

    out = (
        t
        >> pdt.filter(t.a >= 2)
        >> materialize()
        >> pdt.mutate(z=t.a + t.b.str.len())
        >> pdt.export(pdt.Pandas)
    )
    assert sorted(out["z"]) == [3, 6]


def test_ast_repr(spark):
    t = pdt.Table({"a": [1]}, name="t")
    s = t >> pdt.group_by(t.a) >> pdt.ast_repr()
    assert "Table `t`" in s and "grouped by: a" in s and "a: int64" in s


def test_export_schema_overrides(spark):
    t = pdt.Table({"a": [1, 2], "b": [1.7, 2.2]}, name="t")
    out = t >> pdt.export(
        pdt.Spark, schema_overrides={"a": pdt.Float64(), t.b: pdt.String()}
    )
    assert dict(out.dtypes) == {"a": "double", "b": "string"}


def test_list_namespace_ops(spark):
    t = pdt.Table({"s": ["a-b-c", "x", "", None]}, name="t")
    parts = t.s.str.split("-")
    out = (
        t
        >> pdt.mutate(
            n=parts.list.len(),
            first=parts.list.get(0),
            oob=parts.list.get(9),
            has_b=parts.list.contains("b"),
            joined=parts.list.join("+"),
        )
        >> pdt.export(pdt.Pandas)
    )
    assert list(out["n"].fillna(-1)) == [3, 1, 1, -1]
    assert list(out["first"].fillna("?")) == ["a", "x", "", "?"]
    assert out["oob"].isna().all()
    # == comparison instead of fillna(False): pandas deprecated
    # object-dtype downcasting on fillna (FutureWarning)
    assert list(out["has_b"] == True) == [True, False, False, False]  # noqa: E712
    assert list(out["joined"].fillna("?")) == ["a+b+c", "x", "", "?"]


def test_split_literal_metachars(spark):
    # split is literal-substring: '.' must not behave as regex any-char
    t = pdt.Table({"s": ["a.b.c"]}, name="t")
    out = (
        t
        >> pdt.mutate(n=t.s.str.split(".").list.len(),
                      j=t.s.str.split(".").list.join("|"))
        >> pdt.export(pdt.Pandas)
    )
    assert list(out["n"]) == [3]
    assert list(out["j"]) == ["a|b|c"]


def test_typed_errors(spark):
    """Typed error classes match the reference's public error surface
    (reference errors.py) and stay catchable via the builtin they
    semantically refine."""
    t = pdt.Table({"a": [1, 2], "b": ["x", "y"]}, name="t")

    with pytest.raises(pdt.ColumnNotFoundError, match="no column"):
        t["nope"]
    with pytest.raises(KeyError):  # backward-compatible base
        t["nope"]
    with pytest.raises(pdt.ColumnNotFoundError, match="not found"):
        t >> pdt.mutate(x=C.missing + 1) >> pdt.export(pdt.Pandas)

    with pytest.raises(pdt.DataTypeError):
        t >> pdt.mutate(x=t.b.cast(pdt.Duration())) >> pdt.export(pdt.Pandas)

    with pytest.raises(pdt.FunctionTypeError, match="summarize"):
        t >> pdt.summarize(x=t.a.sum() + t.a)
    with pytest.raises(ValueError):  # backward-compatible base
        t >> pdt.summarize(x=t.a.sum() + t.a)
    with pytest.raises(pdt.FunctionTypeError):
        t >> pdt.filter(t.a.sum() > 1)


def test_backend_introspection_and_dtype_exports(spark):
    """Top-level exports matching reference __init__/types: backend(),
    is_sql_backed(), Dtype/Enum/UInt* dtypes."""
    t = pdt.Table({"a": [1, 2], "s": ["x", "y"]}, name="t")
    assert pdt.backend(t) == "spark"
    assert pdt.is_sql_backed(t) is True
    with pytest.raises(TypeError):
        pdt.backend("not a table")

    assert issubclass(pdt.Enum, pdt.Dtype)
    out = (
        t
        >> pdt.mutate(
            u=t.a.cast(pdt.UInt16()),
            e=t.s.cast(pdt.Enum("x", "y", "z")),
        )
        >> pdt.export(pdt.Pandas)
    )
    # UInt16 widens to the next signed Spark type (int32)
    assert str(out["u"].dtype) == "int32"
    assert list(out["e"]) == ["x", "y"]


def test_list_of_dicts_and_backend_shims(spark):
    import pytest as _pytest

    import pydiverse_transform_spark as pdt

    t = pdt.Table({"a": [1, 2]}, "t")
    rows = t >> pdt.export(pdt.ListOfDicts)
    assert rows == [{"a": 1}, {"a": 2}]
    with _pytest.raises(TypeError, match="read_jdbc"):
        t >> pdt.export(pdt.SqlAlchemy(None))


def test_duckdb_export_target(spark):
    """export(DuckDb()) is a real hand-off into DuckDB (r10; the
    reference's collect(DuckDb()) engine switch,
    reference backend/targets.py:22): the Spark result lands zero-copy
    via Arrow as a live duckdb relation."""
    import gc

    import duckdb

    import pydiverse_transform_spark as pdt
    from pydiverse_transform_spark.targets import DuckDb, DuckDbRelation

    t = pdt.Table({"a": [4, 2, 1, 4], "b": ["l", "g", "uu", "r"]}, "demo")
    rel = t >> pdt.mutate(z=t.a * 2) >> pdt.export(DuckDb())
    # private connection: proxy owns it, survives GC, delegates the
    # full relation API
    assert isinstance(rel, DuckDbRelation)
    gc.collect()
    assert rel.aggregate("sum(z) as s").fetchall() == [(22,)]
    assert rel.filter("a > 1").df().shape == (3, 3)
    # the result is also registered on the connection under the table
    # name, so con.sql() works
    assert rel.connection.sql("select count(*) from demo").fetchall() \
        == [(4,)]
    # caller-supplied connection: raw relation, registered under
    # relation_name
    con = duckdb.connect()
    rel2 = t >> pdt.export(DuckDb(con, relation_name="mytab"))
    assert isinstance(rel2, duckdb.DuckDBPyRelation)
    assert con.sql("select sum(a) from mytab").fetchall() == [(11,)]
    # collect() still only supports the Spark pipeline backend, but the
    # error routes users to export(DuckDb())
    with _pytest_raises_typeerror_match("DuckDb"):
        t >> pdt.collect(DuckDb())


def _pytest_raises_typeerror_match(match):
    import pytest as _pytest

    return _pytest.raises(TypeError, match=match)


def test_string_max_length_lattice():
    """String(max_length=) mirrors the reference lattice
    (reference tree/types.py:104-109): any string implicitly converts to
    unbounded String(); a bounded target only accepts a source whose
    bound is known and strictly tighter."""
    from pydiverse_transform_spark import types as tp

    assert pdt.String(10) == pdt.String(10)
    assert pdt.String(10) != pdt.String(5)
    assert pdt.String(10) != pdt.String()
    assert repr(pdt.String(10)) == "str(10)"

    assert tp.converts_to(pdt.String(5), pdt.String())
    assert tp.converts_to(pdt.String(5), pdt.String(10))
    assert not tp.converts_to(pdt.String(10), pdt.String(5))
    assert not tp.converts_to(pdt.String(), pdt.String(5))
    # bounds don't change the physical Spark type
    from pyspark.sql import types as T

    assert tp.to_spark_type(pdt.String(10)) == T.StringType()
    assert tp.from_spark_type(T.VarcharType(7)) == pdt.String(7)


def test_non_standard_warning_export():
    """NonStandardWarning matches reference errors/__init__.py:47-51 and
    is filterable via the warnings machinery."""
    import warnings

    assert issubclass(pdt.NonStandardWarning, UserWarning)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        warnings.warn("backend divergence", pdt.NonStandardWarning)
    assert rec and rec[0].category is pdt.NonStandardWarning


def test_time_dtype_invalid_source_rejected(spark):
    """Time is implemented (r14, µs-since-midnight long), but only the
    reference-sanctioned entry points: Datetime/String sources.  An
    Int source is not a valid cast and must fail at build time."""
    t = pdt.Table({"a": [1, 2]}, name="t")
    with pytest.raises(pdt.DataTypeError, match="cannot cast"):
        t >> pdt.mutate(x=t.a.cast(pdt.Time())) >> pdt.export(pdt.Pandas)


def test_uint_widening_warns_non_standard(spark):
    """Casting to an unsigned dtype emits NonStandardWarning (Spark has
    no unsigned ints; reference backends warn at divergence sites via
    util/warnings.py warn_non_standard)."""
    import warnings

    t = pdt.Table({"a": [1, 2]}, name="t")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = t >> pdt.mutate(x=t.a.cast(pdt.UInt32())) >> pdt.export(pdt.Pandas)
    assert list(out["x"]) == [1, 2]
    assert any(r.category is pdt.NonStandardWarning for r in rec), (
        [str(r.message) for r in rec]
    )
