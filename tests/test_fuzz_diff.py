"""Randomized differential fuzzing (port of the reference's fuzz.py
strategy): generate seeded random typed expression trees from the
operator surface, evaluate through the engine on Spark, and compare
against the same expression rendered to DuckDB SQL (tests/sqlgen.py).
"""

import os
import random

import duckdb
import pyarrow as pa
import pytest

import pydiverse_transform_spark as pdt
from pydiverse_transform_spark import types as tp
from pydiverse_transform_spark.plans.compile import prepare

from oracle_util import compare
from sqlgen import to_sql

# fuzz under BOTH spark.sql.ansi.enabled settings (tests/conftest.py
# ansi_mode): generated trees now include zero/NULL divisors, so this is
# the direct differential check of the mode-independent null-on-edge
# contract
pytestmark = pytest.mark.usefixtures("ansi_both")

# the fuzz relation: null-rich, signed, metachar-rich — no NaN/inf (their
# ordering/printing differs per bridge, tested separately in fixtures)
FUZZ = {
    "ia": [1, -7, 0, 4, None, 1 << 20, -3, 9],
    "ib": [2, 3, -5, None, 8, 1, 6, -2],
    "fx": [0.5, -1.25, 3.75, None, 100.0, -0.0, 2e6, 0.125],
    "fy": [1.5, 2.5, None, -3.5, 0.25, 8.0, -0.5, 4.0],
    "sa": ["a", "", "Hello World", None, "_%", "x'y", "AbC", "  pad  "],
    "sb": ["b", "e", None, "lo", "%", "''", "c", "pad"],
    "pa": [True, False, None, True, False, None, True, False],
    "pb": [True, True, False, None, None, False, True, None],
}

N_EXPRS = int(os.environ.get("FUZZ_N_EXPRS", "120"))
# shift the whole seed band (r6/r7 sweeps rerun the fuzzers under
# several bands; a fixed band alone can miss value-dependent twins)
SEED_BASE = int(os.environ.get("FUZZ_SEED_BASE", "0"))
MAX_DEPTH = 4


class Gen:
    """Typed random expression generator.  Column leaves come from
    ``pools`` ({"int": [...], "float": [...], "str": [...], "bool":
    [...]} of Col refs) so the same generator drives both the flat
    expression fuzz (this file) and the pipeline fuzz
    (test_fuzz_pipeline.py) where the column set evolves per verb."""

    def __init__(self, t, rng: random.Random, pools=None):
        self.t = t
        self.rng = rng
        self.pools = pools or {
            "int": [t.ia, t.ib],
            "float": [t.fx, t.fy],
            "str": [t.sa, t.sb],
            "bool": [t.pa, t.pb],
        }

    def any_expr(self, depth):
        kinds = [k for k in ("int", "float", "str", "bool") if self.pools[k]]
        kind = self.rng.choice(kinds)
        return getattr(self, kind)(depth)

    # --- typed generators -------------------------------------------------
    def int(self, depth):
        r = self.rng
        if depth <= 0:
            return r.choice(
                self.pools["int"] + [pdt.lit(r.randint(-9, 9))]
            )
        p = r.random()
        if p < 0.35:
            a, b = self.int(depth - 1), self.int(depth - 1)
            op = r.choice(["+", "-", "*"])
            return {"+": a + b, "-": a - b, "*": a * b}[op]
        if p < 0.45:
            # arbitrary divisors, including 0 and NULL: the engine
            # contract is x // 0 == x % 0 == NULL in both ANSI modes
            # (nullif-guarded div / try_mod), exactly like DuckDB
            d = (
                self.int(depth - 1)
                if r.random() < 0.5
                else pdt.lit(r.choice([2, 3, -3, 7, 0]))
            )
            return (
                self.int(depth - 1) // d
                if r.random() < 0.5
                else self.int(depth - 1) % d
            )
        if p < 0.55:
            return -self.int(depth - 1)
        if p < 0.65:
            return self.int(depth - 1).abs()
        if p < 0.72:
            return self.str(depth - 1).str.len()
        if p < 0.78:
            return self.str(depth - 1).str.split(
                r.choice(["-", "l", " ", "%"])
            ).list.len()
        if p < 0.85:
            return self.int(depth - 1).fill_null(self.int(depth - 1))
        return (
            pdt.when(self.bool(depth - 1))
            .then(self.int(depth - 1))
            .otherwise(self.int(depth - 1))
        )

    def float(self, depth):
        r = self.rng
        if depth <= 0:
            return r.choice(
                self.pools["float"] + [pdt.lit(r.choice([0.5, -2.5, 3.0]))]
            )
        p = r.random()
        if p < 0.3:
            a, b = self.float(depth - 1), self.float(depth - 1)
            return {"+": a + b, "-": a - b, "*": a * b}[r.choice("+-*")]
        if p < 0.4:
            # divisor may be 0.0 or NULL — x / 0 is NULL in both ANSI
            # modes (try_divide), matching DuckDB
            d = (
                self.float(depth - 1)
                if r.random() < 0.5
                else pdt.lit(r.choice([2.0, -4.0, 0.5, 0.0]))
            )
            return self.float(depth - 1) / d
        if p < 0.5:
            return self.float(depth - 1).round(r.choice([0, 1, 2]))
        if p < 0.6:
            return self.float(depth - 1).abs()
        if p < 0.7:
            return pdt.max(self.float(depth - 1), self.float(depth - 1))
        if p < 0.8:
            return self.float(depth - 1).fill_null(pdt.lit(0.25))
        return (
            pdt.when(self.bool(depth - 1))
            .then(self.float(depth - 1))
            .otherwise(self.float(depth - 1))
        )

    def str(self, depth):
        r = self.rng
        if depth <= 0:
            return r.choice(self.pools["str"] + [pdt.lit("zz")])
        p = r.random()
        if p < 0.2:
            return self.str(depth - 1) + self.str(depth - 1)
        if p < 0.35:
            return self.str(depth - 1).str.upper()
        if p < 0.5:
            return self.str(depth - 1).str.lower()
        if p < 0.6:
            return self.str(depth - 1).str.strip()
        if p < 0.66:
            return self.str(depth - 1).str.slice(
                pdt.lit(r.randint(0, 3)), pdt.lit(r.randint(1, 4))
            )
        if p < 0.72:
            parts = self.str(depth - 1).str.split(
                r.choice(["-", "l", " "])
            )
            return (
                parts.list.get(r.randint(0, 2))
                if r.random() < 0.5
                else parts.list.join(r.choice(["/", "", "|"]))
            )
        if p < 0.8:
            return self.str(depth - 1).fill_null(pdt.lit("-"))
        return (
            pdt.when(self.bool(depth - 1))
            .then(self.str(depth - 1))
            .otherwise(self.str(depth - 1))
        )

    def bool(self, depth):
        r = self.rng
        if depth <= 0:
            if self.pools["bool"]:
                return r.choice(self.pools["bool"])
            return self.int(0) > pdt.lit(r.randint(-5, 5))
        p = r.random()
        if p < 0.15:
            return self.bool(depth - 1) & self.bool(depth - 1)
        if p < 0.3:
            return self.bool(depth - 1) | self.bool(depth - 1)
        if p < 0.4:
            return ~self.bool(depth - 1)
        if p < 0.5:
            return self.bool(depth - 1) ^ self.bool(depth - 1)
        if p < 0.65:
            a, b = self.int(depth - 1), self.int(depth - 1)
            import operator as _op

            return r.choice(
                [_op.eq, _op.ne, _op.lt, _op.le, _op.gt, _op.ge]
            )(a, b)
        if p < 0.72:
            return self.str(depth - 1).str.contains("a", allow_regex=False)
        if p < 0.78:
            return self.str(depth - 1).str.split(
                r.choice(["-", "l", " "])
            ).list.contains(pdt.lit(r.choice(["a", "lo", ""])))
        if p < 0.85:
            return self.any_col().is_null()
        return self.int(depth - 1).is_in(
            pdt.lit(r.randint(-5, 5)), pdt.lit(r.randint(-5, 5))
        )

    def any_col(self):
        allc = [c for pool in self.pools.values() for c in pool]
        return self.rng.choice(allc)


@pytest.fixture(scope="module")
def fuzz_setup(spark):
    t = pdt.from_dict(spark, FUZZ, name="fuzz")
    con = duckdb.connect()
    con.register("fuzz", pa.table(FUZZ))
    return t, con


def test_fuzz_differential(spark, fuzz_setup):
    t, con = fuzz_setup
    rng = random.Random(SEED_BASE + 42)
    gen = Gen(t, rng)
    failures = []
    n_run = 0
    for i in range(N_EXPRS):
        expr = gen.any_expr(MAX_DEPTH)
        try:
            prepared = prepare(expr, t._scope(), "mutate")
            sql_expr = to_sql(prepared)
        except NotImplementedError:
            continue
        # large int multiplication can overflow differently; DuckDB
        # promotes to HUGEINT while Spark ANSI raises — skip on overflow
        out = t >> pdt.mutate(v=expr) >> pdt.select(t.ia, "v")
        sql = f"SELECT ia, {sql_expr} AS v FROM fuzz"
        try:
            df = out >> pdt.export(pdt.Spark)
            ok, msg = compare(df, con, sql, f"fuzz[{i}]")
        except Exception as e:
            # int64 overflow is a DOCUMENTED backend divergence, exactly
            # like the reference's: DuckDB raises OutOfRange, Polars (and
            # non-ANSI Spark) wraps, ANSI Spark raises.  Skip whichever
            # side raised (case-insensitive: Spark says
            # ARITHMETIC_OVERFLOW, DuckDB "Overflow in multiplication").
            if "overflow" in str(e).lower():
                continue
            ok, msg = False, f"fuzz[{i}] EXCEPTION {e} \nSQL: {sql}"
        n_run += 1
        if not ok:
            failures.append(msg + f"\n  SQL: {sql}")
    assert n_run >= 40, f"only {n_run} comparable expressions generated"
    assert not failures, (
        f"{len(failures)}/{n_run} mismatches:\n" + "\n".join(failures[:5])
    )
