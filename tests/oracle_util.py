"""Local mirror of the driver's correctness check: run each
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
on DuckDB over the same parquet, compare row count + schema +
order-insensitive value hash.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; gen_scale_corpus replicas
        # are Spark-style directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        # Decimal -> Float64 before compare, like the reference harness
        # (reference tests/util/assertion.py:60-136)
        v = float(v)
    # NaN and NULL normalize to the same token: the pandas bridges are
    # lossy here (Spark's toPandas yields None for a null boolean where
    # DuckDB's fetchdf yields NaN, and nullable ints become NaN floats on
    # both sides), so the distinction cannot be round-tripped reliably.
    if v is None or v is pd.NA:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0.0:
            v = 0.0  # -0.0 and 0.0 print identically
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        # round-trip-exact float text: the driver hashes exact values, so a
        # looser %.6g here would let one-ulp summation jitter pass locally
        # and fail the driver gate (round-2 q_agg_extras failure mode)
        return f"{v:.17g}"
    if hasattr(v, "tolist") and not hasattr(v, "isoformat"):
        # numpy array (DuckDB fetchdf renders LIST columns as ndarray)
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    rows = [
        "|".join(_norm_cell(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    return sorted(rows)


def compare(spark_df, con, sql: str, name: str = "?") -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    if len(sp) != len(du):
        return False, f"{name}: row count {len(sp)} vs oracle {len(du)}"
    if sorted(sp.columns) != sorted(du.columns):
        return False, (
            f"{name}: columns {sorted(sp.columns)} vs {sorted(du.columns)}"
        )
    a, b = normalize(sp), normalize(du)
    if a != b:
        diffs = [
            f"  spark: {x}\n  duck : {y}" for x, y in zip(a, b) if x != y
        ][:3]
        return False, f"{name}: value mismatch\n" + "\n".join(diffs)
    return True, f"{name}: OK ({len(sp)} rows)"
