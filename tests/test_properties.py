"""Hypothesis property tests for the deterministic-sampling layer:
algebraic invariants checked against pure-Python twins on generated
tables (shrinking finds minimal counterexamples — the complement of the
seeded DuckDB fuzzers, which check engine parity on fixed draws).

Spark jobs per example are the cost ceiling: examples are capped and
deadlines disabled (a Spark action is milliseconds-to-seconds, not the
hypothesis default 200 ms)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import importance as imp
from pydiverse_transform_spark.extras import sampling as sp

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


def _u(key, salt=""):
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()
    return int(h[:8], 16) / 2.0 ** 32


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.one_of(st.none(),
                  st.floats(-100, 100, allow_nan=False, width=32)),
        st.integers(0, 50),
    ),
    min_size=1, max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, g, s, t) for i, (g, s, t) in enumerate(rows)],
        "id long, g string, score double, toks long",
    )


@given(rows=rows_strategy,
       weights=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=4))
@settings(**SETTINGS)
def test_hash_split_partitions_and_is_append_stable(spark, rows, weights):
    total = sum(weights)
    w = {f"s{i}": v / total for i, v in enumerate(weights)}
    # float-sum the weights the way the implementation validates them
    df = _df(spark, rows)
    out = {r["id"]: r["split"]
           for r in sp.hash_split(df, w, "id").collect()}
    # every row gets exactly one split
    assert set(out) == set(range(len(rows)))
    assert set(out.values()) <= set(w)
    # append stability: the assignment of existing rows never moves
    grown = _df(spark, rows + [("a", 1.0, 1)] * 3)
    out2 = {r["id"]: r["split"]
            for r in sp.hash_split(grown, w, "id").collect()}
    for i in out:
        assert out2[i] == out[i]


@given(rows=rows_strategy, budget=st.integers(1, 60))
@settings(**SETTINGS)
def test_pack_sequences_twin_and_bounds(spark, rows, budget):
    df = _df(spark, rows)
    got = {r["id"]: (r["bin_id"], r["bin_pos"])
           for r in sp.pack_sequences(df, "toks", budget=budget,
                                      order_by="id",
                                      partition_by="g").collect()}
    # python twin: cumulative layout per group in id order
    by_g = {}
    for i, (g, s, t) in enumerate(rows):
        by_g.setdefault(g, []).append((i, t))
    for g, items in by_g.items():
        before = 0
        for i, t in items:
            assert got[i] == (before // budget, before % budget), (g, i)
            assert 0 <= got[i][1] < budget
            before += t


@given(rows=rows_strategy, q=st.floats(0, 1))
@settings(**SETTINGS)
def test_filter_by_quantile_exact_twin(spark, rows, q):
    df = _df(spark, rows)
    kept = {r["id"] for r in sp.filter_by_quantile(
        df, "score", q, partition_by=["g"], exact=True).collect()}
    # twin: per group, discrete quantile threshold (smallest score with
    # cume fraction >= q), keep score >= threshold, ties as a unit
    by_g = {}
    for i, (g, s, t) in enumerate(rows):
        if s is not None:
            by_g.setdefault(g, []).append((s, i))
    want = set()
    for g, items in by_g.items():
        scores = sorted(s for s, _ in items)
        n = len(scores)
        # EXACT float semantics: Spark's cume_dist is k/n (double
        # division) compared >= q — mirror it bit-for-bit, no epsilon
        thr = next((s for k, s in enumerate(scores, 1)
                    if k / n >= q), scores[-1])
        want |= {i for s, i in items if s >= thr}
    assert kept == want


@given(rows=rows_strategy, budget=st.integers(1, 80))
@settings(**SETTINGS)
def test_take_token_budget_prefix_property(spark, rows, budget):
    df = _df(spark, rows)
    kept = {r["id"] for r in sp.take_token_budget(
        df, "toks", budget, order_by="id",
        partition_by=["g"]).collect()}
    by_g = {}
    for i, (g, s, t) in enumerate(rows):
        by_g.setdefault(g, []).append((i, t))
    want = set()
    for g, items in by_g.items():
        cum = 0
        for i, t in items:
            if cum < budget:
                want.add(i)
            cum += t
    assert kept == want


@given(rows=rows_strategy, n_shards=st.integers(1, 8))
@settings(**SETTINGS)
def test_deterministic_shuffle_is_bijection(spark, rows, n_shards):
    df = _df(spark, rows)
    out = sp.deterministic_shuffle(df, "id", n_shards=n_shards).collect()
    addrs = {(r["shard"], r["shard_pos"]) for r in out}
    assert len(addrs) == len(rows)  # injective addressing
    assert all(0 <= r["shard"] < n_shards for r in out)
    # positions are 1..count(shard) per shard, no gaps
    per = {}
    for r in out:
        per.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # address of a row is a pure function of its key: recompute shard
    for r in out:
        h = hashlib.md5(f"{r['id']}".encode()).hexdigest()
        assert r["shard"] == int(h[:4], 16) % n_shards


@given(rows=rows_strategy, k=st.integers(1, 10))
@settings(**SETTINGS)
def test_gumbel_topk_twin(spark, rows, k):
    df = _df(spark, rows).withColumn(
        "w", F.coalesce(F.col("score"), F.lit(0.0)))
    kept = {r["id"] for r in imp.gumbel_topk(
        df, "w", k, "id", salt="prop").collect()}
    scored = []
    for i, (g, s, t) in enumerate(rows):
        u = max(_u(i, "prop"), 1.0 / 2 ** 32)
        scored.append(((s or 0.0) - math.log(-math.log(u)), -i))
    want = {-i for _, i in sorted(scored, reverse=True)[:k]}
    assert kept == {w for w in want}
