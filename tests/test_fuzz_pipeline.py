"""Pipeline-level differential fuzzing: random verb CHAINS (mutate /
filter / arrange+slice_head / group_by+summarize), mirrored step by step
into DuckDB SQL subqueries and compared at the end.  Extends the flat
expression fuzz (test_fuzz_diff.py) to the interactions between verbs —
where column scoping, grouping state, and ordering bugs actually live.
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
from test_fuzz_diff import FUZZ, Gen

# verb-chain fuzzing also runs under BOTH spark.sql.ansi.enabled modes
# (tests/conftest.py ansi_mode) — same contract as the flat expression fuzz
pytestmark = pytest.mark.usefixtures("ansi_both")

# unique key enables deterministic arrange+slice steps
PFUZZ = {**FUZZ, "rid": list(range(len(FUZZ["ia"])))}

N_PIPELINES = int(os.environ.get("FUZZ_N_PIPELINES", "40"))
SEED_BASE = int(os.environ.get("FUZZ_SEED_BASE", "0"))
MAX_STEPS = 4


def _pools(t):
    pools = {"int": [], "float": [], "str": [], "bool": []}
    for name, dtype in t.dtypes.items():
        if isinstance(dtype, tp.Bool):
            pools["bool"].append(t[name])
        elif isinstance(dtype, (tp.Int64, tp.Int32)):
            pools["int"].append(t[name])
        elif isinstance(dtype, (tp.Float64, tp.Float32)):
            pools["float"].append(t[name])
        elif isinstance(dtype, tp.String):
            pools["str"].append(t[name])
    return pools


class PipelineGen:
    """One random pipeline: (pdt table, mirrored SQL text) per step."""

    def __init__(self, t0, rng):
        self.t = t0
        self.sql = "SELECT * FROM pfuzz"
        self.rng = rng
        self.k = 0
        self.grouped_already = False
        self.rid_unique = True

    def _gen(self):
        return Gen(self.t, self.rng, pools=_pools(self.t))

    def _expr(self, kind, depth=2):
        g = self._gen()
        expr = getattr(g, kind)(depth)
        prepared = prepare(expr, self.t._scope(), "mutate")
        return expr, to_sql(prepared)

    def step_mutate(self):
        kind = self.rng.choice(["int", "float", "str", "bool"])
        try:
            expr, sql_e = self._expr(kind)
        except NotImplementedError:
            return False
        name = f"v{self.k}"
        self.k += 1
        self.t = self.t >> pdt.mutate(**{name: expr})
        self.sql = f"SELECT *, {sql_e} AS {name} FROM ({self.sql})"
        return True

    def step_filter(self):
        try:
            expr, sql_e = self._expr("bool")
        except NotImplementedError:
            return False
        self.t = self.t >> pdt.filter(expr)
        self.sql = f"SELECT * FROM ({self.sql}) WHERE {sql_e}"
        return True

    def step_arrange_slice(self):
        # rid is only a deterministic tiebreaker while it is still a key
        # (a fan-out join duplicates it)
        if "rid" not in self.t.columns or not self.rid_unique:
            return False
        pools = _pools(self.t)
        sortable = pools["int"] + pools["float"] + pools["str"]
        key = self.rng.choice(sortable)
        desc = self.rng.random() < 0.5
        nl = self.rng.random() < 0.5
        marked = key.descending() if desc else key.ascending()
        marked = marked.nulls_last() if nl else marked.nulls_first()
        n = self.rng.randint(2, 6)
        off = self.rng.choice([0, 1, 3])
        self.t = (
            self.t
            >> pdt.arrange(marked, self.t.rid)
            >> pdt.slice_head(n, offset=off)
        )
        dir_sql = "DESC" if desc else "ASC"
        nl_sql = "NULLS LAST" if nl else "NULLS FIRST"
        self.sql = (
            f"SELECT * FROM ({self.sql}) "
            f"ORDER BY {key.name} {dir_sql} {nl_sql}, rid "
            f"LIMIT {n} OFFSET {off}"
        )
        return True

    def step_window(self):
        """Window-promotion step: shift / row_number / rank / cum_sum in
        a mutate, optionally partitioned by a bool column, ordered by a
        sortable key with the unique rid as tiebreaker — the SQL mirror
        is an explicit OVER clause, so this differentially pins the
        engine's window compilation (partition spec, order markers,
        running frame) inside arbitrary verb chains."""
        if "rid" not in self.t.columns or not self.rid_unique:
            return False
        pools = _pools(self.t)
        sortable = pools["int"] + pools["float"] + pools["str"]
        vals = pools["int"] + pools["float"]
        if not sortable or not vals:
            return False
        key = self.rng.choice(sortable)
        desc = self.rng.random() < 0.5
        nl = self.rng.random() < 0.5
        marked = key.descending() if desc else key.ascending()
        marked = marked.nulls_last() if nl else marked.nulls_first()
        order = [marked, self.t.rid]
        part, part_sql = None, ""
        if pools["bool"] and self.rng.random() < 0.5:
            p = self.rng.choice(pools["bool"])
            part, part_sql = [p], f"PARTITION BY {p.name} "
        dir_sql = "DESC" if desc else "ASC"
        nl_sql = "NULLS LAST" if nl else "NULLS FIRST"
        over = (f"OVER ({part_sql}ORDER BY {key.name} {dir_sql} {nl_sql},"
                f" rid")
        v = self.rng.choice(vals)
        name = f"v{self.k}"
        self.k += 1
        kind = self.rng.choice(["shift", "row_number", "rank", "cum_sum"])
        if kind == "shift":
            expr = v.shift(1, partition_by=part, arrange=order)
            sql_e = f"lag({v.name}) {over})"
        elif kind == "row_number":
            expr = pdt.row_number(partition_by=part, arrange=order)
            sql_e = f"row_number() {over})"
        elif kind == "rank":
            expr = pdt.rank(partition_by=part, arrange=order)
            sql_e = f"rank() {over})"
        else:
            expr = v.cum_sum(partition_by=part, arrange=order)
            sql_e = (f"sum({v.name}) {over} ROWS BETWEEN UNBOUNDED "
                     f"PRECEDING AND CURRENT ROW)")
            if any(v is c for c in pools["int"]):
                # DuckDB sum(BIGINT) is HUGEINT, which fetchdf bridges
                # to float64 ("24.000000" vs Spark's LONG "24") — the
                # same reason every driver oracle CASTs integer sums.
                # Found by the round-6 shifted-seed sweep (pipe[21]).
                sql_e = f"CAST({sql_e} AS BIGINT)"
        self.t = self.t >> pdt.mutate(**{name: expr})
        self.sql = f"SELECT *, {sql_e} AS {name} FROM ({self.sql})"
        return True

    def step_group_summarize(self):
        if self.grouped_already:
            return False
        pools = _pools(self.t)
        keys = pools["int"] + pools["str"] + pools["bool"]
        if not keys:
            return False
        g = self.rng.choice(keys)
        aggs, agg_sqls = {}, []
        # order-independent, exactly-reproducible aggregates only:
        # sum/min/max/count on ints, min/max on strings, count(*)
        for i, src in enumerate(self.rng.sample(
                pools["int"], min(2, len(pools["int"])))):
            if src.name == g.name:
                continue
            fn = self.rng.choice(["sum", "min", "max"])
            aggs[f"a{i}"] = getattr(src, fn)()
            agg_sqls.append(
                f"CAST({fn}({src.name}) AS BIGINT) AS a{i}"
            )
        for i, src in enumerate(self.rng.sample(
                pools["str"], min(1, len(pools["str"])))):
            if src.name == g.name:
                continue
            fn = self.rng.choice(["min", "max"])
            aggs[f"s{i}"] = getattr(src, fn)()
            agg_sqls.append(f"{fn}({src.name}) AS s{i}")
        aggs["n"] = pdt.count()
        agg_sqls.append("count(*) AS n")
        self.t = (
            self.t
            >> pdt.group_by(g)
            >> pdt.summarize(**aggs)
        )
        self.sql = (
            f"SELECT {g.name}, {', '.join(agg_sqls)} "
            f"FROM ({self.sql}) GROUP BY {g.name}"
        )
        self.grouped_already = True
        return True

    def step_join_base(self):
        """Equi-join the evolving pipeline back to the base table on a
        modular bucket of rid — exercises column resolution and suffix
        renaming mid-pipeline.  Joined columns get fresh names via
        mutate so the mirrored SQL stays unambiguous."""
        if "rid" not in self.t.columns or self.grouped_already:
            return False
        base = pdt.from_dict(
            self.t._df.sparkSession, PFUZZ, name=f"b{self.k}"
        ) >> pdt.alias(f"b{self.k}")
        m = self.rng.choice([2, 3])
        name = f"j{self.k}"
        self.k += 1
        joined = self.t >> pdt.inner_join(
            base, on=(self.t.rid % m) == (base.rid % m)
        )
        keep = [c for c in self.t.columns]
        self.t = (
            joined
            >> pdt.mutate(**{name: base.ia + base.ib.fill_null(pdt.lit(0))})
            >> pdt.select(*keep, name)
        )
        self.sql = (
            f"SELECT L.*, R.ia + coalesce(R.ib, 0) AS {name} "
            f"FROM ({self.sql}) L JOIN pfuzz R "
            f"ON L.rid % {m} = R.rid % {m}"
        )
        self.rid_unique = False
        return True

    def step_semi_anti(self):
        """semi/anti join against a filtered base table on an int-column
        equality — exercises the filtering joins' NULL semantics (NULL
        keys never match, so anti KEEPS them) mid-pipeline."""
        pools = _pools(self.t)
        if not pools["int"]:
            return False
        key = self.rng.choice(pools["int"])
        base = pdt.from_dict(
            self.t._df.sparkSession, PFUZZ, name=f"f{self.k}"
        ) >> pdt.alias(f"f{self.k}")
        self.k += 1
        m = self.rng.choice([2, 3, 5])
        r = self.rng.randint(0, m - 1)
        sub = base >> pdt.filter((base.ib % m) == r)
        how = self.rng.choice(["semi", "anti"])
        verb = pdt.semi_join if how == "semi" else pdt.anti_join
        self.t = self.t >> verb(sub, on=key == sub.ia)
        op = "EXISTS" if how == "semi" else "NOT EXISTS"
        self.sql = (
            f"SELECT * FROM ({self.sql}) a WHERE {op} "
            f"(SELECT 1 FROM pfuzz b WHERE a.{key.name} = b.ia "
            f"AND b.ib % {m} = {r})"
        )
        return True

    def run(self, n_steps):
        steps = [self.step_mutate, self.step_filter,
                 self.step_arrange_slice, self.step_group_summarize,
                 self.step_join_base, self.step_semi_anti,
                 self.step_window]
        for _ in range(n_steps):
            step = self.rng.choice(steps)
            step()
        return self.t, self.sql


@pytest.fixture(scope="module")
def pfuzz_setup(spark):
    t = pdt.from_dict(spark, PFUZZ, name="pfuzz")
    con = duckdb.connect()
    con.register("pfuzz", pa.table(PFUZZ))
    return t, con


def test_fuzz_pipelines(spark, pfuzz_setup):
    t0, con = pfuzz_setup
    failures = []
    n_run = 0
    for seed in range(N_PIPELINES):
        rng = random.Random(SEED_BASE + 1000 + seed)
        pg = PipelineGen(t0, rng)
        table, sql = pg.run(rng.randint(2, MAX_STEPS))
        try:
            df = table >> pdt.export(pdt.Spark)
            ok, msg = compare(df, con, sql, f"pipe[{seed}]")
        except Exception as e:
            s = str(e)
            if "ARITHMETIC_OVERFLOW" in s or "overflow" in s.lower():
                continue
            ok, msg = False, f"pipe[{seed}] EXCEPTION {s[:400]}\nSQL: {sql}"
        n_run += 1
        if not ok:
            failures.append(msg + f"\n  SQL: {sql}")
    assert n_run >= 20, f"only {n_run} comparable pipelines"
    assert not failures, (
        f"{len(failures)}/{n_run} mismatches:\n" + "\n\n".join(failures[:3])
    )
