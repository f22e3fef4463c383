"""Render a prepared pdt expression tree to DuckDB SQL — used by the
differential fuzzer (the port of the reference's fuzz.py:75-117, which
compared random expression trees across backends; here the second
backend is DuckDB SQL text).

Covers the deterministic element-wise subset: arithmetic, comparisons,
Kleene logic, null ops, string ops, case/when, horizontal ops, casts.
"""

from __future__ import annotations

import datetime as dt

from pydiverse_transform_spark import types as tp
from pydiverse_transform_spark.plans.expr import (
    CaseExpr,
    Cast,
    Col,
    ColFn,
    LiteralCol,
)


def lit_sql(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, dt.date):
        return f"DATE '{v.isoformat()}'"
    raise NotImplementedError(f"literal {v!r}")


def _is_str(e) -> bool:
    return isinstance(e._dtype, tp.String)


def to_sql(e) -> str:
    if isinstance(e, Col):
        return e.name
    if isinstance(e, LiteralCol):
        return lit_sql(e.val)
    if isinstance(e, Cast):
        target = {
            tp.Int64: "BIGINT", tp.Float64: "DOUBLE", tp.String: "VARCHAR",
        }[type(e.target)]
        inner = to_sql(e.expr)
        if isinstance(e.target, tp.Int64) and e.expr._dtype.is_float():
            inner = f"trunc({inner})"  # Float->Int truncates toward zero
        fn = "TRY_CAST" if not e.strict else "CAST"
        return f"{fn}({inner} AS {target})"
    if isinstance(e, CaseExpr):
        parts = ["CASE"]
        for c, v in e.cases:
            parts.append(f"WHEN {to_sql(c)} THEN {to_sql(v)}")
        if e.default is not None:
            parts.append(f"ELSE {to_sql(e.default)}")
        parts.append("END")
        return " ".join(parts)
    if isinstance(e, ColFn):
        return _fn_sql(e)
    raise NotImplementedError(f"to_sql({e!r})")


def _fn_sql(e: ColFn) -> str:
    a = [to_sql(x) for x in e.args]
    op = e.op
    if op == "add":
        if _is_str(e.args[0]):
            return f"({a[0]} || {a[1]})"
        return f"({a[0]} + {a[1]})"
    if op == "sub":
        return f"({a[0]} - {a[1]})"
    if op == "mul":
        return f"({a[0]} * {a[1]})"
    if op == "truediv":
        return f"({a[0]} / {a[1]})"
    if op == "floordiv":
        return f"({a[0]} // {a[1]})"
    if op == "mod":
        return f"({a[0]} % {a[1]})"
    if op == "pow":
        return f"pow({a[0]}, {a[1]})"
    if op == "neg":
        # space after the minus: "-(-1)" rendered as "--1" would start a
        # SQL line comment
        return f"(- {a[0]})"
    if op == "pos":
        return f"({a[0]})"
    if op == "abs":
        return f"abs({a[0]})"
    if op == "round":
        d = e.args[1].val if len(e.args) > 1 else 0
        return f"round({a[0]}, {d})"
    if op == "floor":
        return f"floor({a[0]})"
    if op == "ceil":
        return f"ceil({a[0]})"
    if op == "sqrt":
        return f"sqrt({a[0]})"
    if op in ("eq", "ne", "lt", "le", "gt", "ge"):
        sym = {"eq": "=", "ne": "<>", "lt": "<", "le": "<=", "gt": ">",
               "ge": ">="}[op]
        return f"({a[0]} {sym} {a[1]})"
    if op == "is_null":
        return f"({a[0]} IS NULL)"
    if op == "is_not_null":
        return f"({a[0]} IS NOT NULL)"
    if op == "fill_null":
        return f"coalesce({a[0]}, {a[1]})"
    if op == "is_in":
        if len(a) == 1:
            return "FALSE"
        return "(" + " OR ".join(f"({a[0]} = {v})" for v in a[1:]) + ")"
    if op == "clip":
        return (f"(CASE WHEN {a[0]} IS NULL THEN NULL "
                f"ELSE greatest(least({a[0]}, {a[2]}), {a[1]}) END)")
    if op == "bool_and":
        return f"({a[0]} AND {a[1]})"
    if op == "bool_or":
        return f"({a[0]} OR {a[1]})"
    if op == "bool_xor":
        return f"({a[0]} <> {a[1]})"
    if op == "bool_invert":
        return f"(NOT {a[0]})"
    if op == "str_upper":
        return f"upper({a[0]})"
    if op == "str_lower":
        return f"lower({a[0]})"
    if op == "str_len":
        return f"length({a[0]})"
    if op == "str_strip":
        return f"regexp_replace({a[0]}, '^\\s+|\\s+$', '', 'g')"
    if op == "str_replace_all":
        return f"replace({a[0]}, {a[1]}, {a[2]})"
    if op == "str_starts_with":
        return f"starts_with({a[0]}, {a[1]})"
    if op == "str_ends_with":
        return f"ends_with({a[0]}, {a[1]})"
    if op == "str_contains":
        return f"contains({a[0]}, {a[1]})"  # fuzz uses allow_regex=False
    if op == "str_slice":
        return f"substr({a[0]}, {a[1]} + 1, {a[2]})"
    if op == "str_split":
        # engine \Q..\E-quotes the separator => literal split, which is
        # exactly DuckDB's string_split
        return f"string_split({a[0]}, {a[1]})"
    if op == "list_len":
        return f"len({a[0]})"
    if op == "list_get":
        # engine is 0-based (python/polars convention); DuckDB is 1-based
        return f"({a[0]})[{e.args[1].val} + 1]"
    if op == "list_contains":
        return f"list_contains({a[0]}, {a[1]})"
    if op == "list_join":
        return f"array_to_string({a[0]}, {a[1]})"
    if op == "h_max":
        return f"greatest({', '.join(a)})" if len(a) > 1 else a[0]
    if op == "h_min":
        return f"least({', '.join(a)})" if len(a) > 1 else a[0]
    if op == "coalesce":
        return f"coalesce({', '.join(a)})"
    if op == "h_any":
        return "(" + " OR ".join(a) + ")"
    if op == "h_all":
        return "(" + " AND ".join(a) + ")"
    if op == "h_sum":
        return "(" + " + ".join(a) + ")"
    raise NotImplementedError(f"no SQL template for op `{op}`")
