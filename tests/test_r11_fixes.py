"""Round-11 fixes: the r10 VERDICT punch list + ADVICE findings.

- ``q_semdedup_cells`` driver row actually executes the cell-local
  component kernel (VERDICT r10 next #2): plan contains the
  applyInPandas stage and the result equals the pairs lane
- ``component_backend='cells'`` + ``pair_backend='sql'`` now raises
  (ADVICE r10 #2: the combination silently ran the half-even kernel
  lane, contradicting the documented sql pin)
- ``semdedup(cells=)`` without ``vec_dim=`` derives the dim from the
  first non-null vector and warns (ADVICE r10 #1: a dim-mismatched
  vector previously null-padded into a real bucket and crashed the
  Arrow kernels on the ragged batch)
- ``DuckDbRelation`` forwards the protocol dunders the docstring
  promises (ADVICE r10 #3) and ``export(DuckDb(relation_name=))``
  validates instead of silently rewriting / clobbering (ADVICE #4)
- ``bench.py`` judges its own load sentinel (VERDICT r10 next #3)
- the plan-audit gate reads its baseline from the newest committed
  PLAN_AUDIT artifact (VERDICT r10 next #5) — consistency asserted
  here so the artifact and the gate cannot drift
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import similarity as sim

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q_semdedup_cells: the kernel lane has a driver-hash row (VERDICT #2)
# ---------------------------------------------------------------------------

def test_semdedup_cells_runs_the_kernel_and_matches_pairs(spark):
    """The pinned cells backend must (a) put the applyInPandas kernel
    in the physical plan — the evidence the r10 verdict found missing —
    and (b) agree with the pairs lane bit-for-bit at this threshold."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_audit import audit_plan, final_plan

    import __spark_entry__ as entry_mod

    cells_df = entry_mod.q_semdedup_cells(spark, SF_DIR)
    got = [r["vec_id"] for r in cells_df.collect()]
    plan = final_plan(cells_df)
    assert "FlatMapGroupsInPandas" in plan, (
        "q_semdedup_cells did not execute the cell-local component "
        "kernel — the driver row would not cover the r10 lane")
    assert audit_plan(plan)["n_python"] >= 1
    want = [r["vec_id"]
            for r in entry_mod.q_semdedup(spark, SF_DIR).collect()]
    assert got == want


def test_cells_backend_rejects_sql_pin(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = sim.hyperplanes(64, 8, seed="semdedup")
    with pytest.raises(ValueError, match="pair_backend='sql' pin"):
        sim.semdedup(emb, cents, threshold=0.4,
                     component_backend="cells", pair_backend="sql")


# ---------------------------------------------------------------------------
# semdedup(cells=) without vec_dim (ADVICE r10 #1)
# ---------------------------------------------------------------------------

def _ragged_corpus(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [1.0, 0.0]),          # dim-mismatched: unmatchable
            (4, []),                  # empty: unmatchable
            (5, None)]                # null: unmatchable
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cells_without_vec_dim_warns_and_guards(spark):
    df = _ragged_corpus(spark)
    cells = F.abs(F.xxhash64(F.col("embedding"))) % 4
    with pytest.warns(UserWarning, match="derived the quantizer dim"):
        out = sim.semdedup(df, None, threshold=0.9, cells=cells,
                           component_backend="cells")
        kept = sorted(r["vec_id"] for r in out.collect())
    # 0/1 are exact duplicates -> one survives; every unmatchable row
    # survives (never paired) instead of crashing np.vstack
    assert kept == [0, 2, 3, 4, 5]


def test_cells_with_vec_dim_does_not_warn(spark):
    import warnings

    df = _ragged_corpus(spark)
    cells = F.abs(F.xxhash64(F.col("embedding"))) % 4
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        out = sim.semdedup(df, None, threshold=0.9, cells=cells,
                           vec_dim=3, component_backend="cells")
        kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [0, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# DuckDb export target protocol dunders + name validation (ADVICE #3/#4)
# ---------------------------------------------------------------------------

def _export_duckdb(spark, target):
    import pydiverse_transform_spark as pdt

    t = pdt.Table({"k": [1, 2], "v": ["a", "b"]}, "t r11")
    return t >> pdt.arrange(t.k) >> pdt.export(target)


def test_duckdb_relation_protocol_dunders(spark):
    import pydiverse_transform_spark as pdt

    rel = _export_duckdb(spark, pdt.DuckDb())
    assert len(rel) == 2
    assert "k" in rel and "missing" not in rel        # __contains__
    assert list(rel) == [(1, "a"), (2, "b")]          # __iter__
    proj = rel["v"]                                   # __getitem__
    assert [r[0] for r in proj.fetchall()] == ["a", "b"]


def test_duckdb_relation_name_validated(spark):
    import pydiverse_transform_spark as pdt

    with pytest.raises(ValueError, match="not a plain identifier"):
        _export_duckdb(spark, pdt.DuckDb(relation_name="bad name!"))


def test_duckdb_no_silent_clobber_on_user_connection(spark):
    import duckdb

    import pydiverse_transform_spark as pdt

    con = duckdb.connect()
    con.sql("CREATE VIEW mine AS SELECT 42 AS x")
    with pytest.raises(ValueError, match="already names a view"):
        _export_duckdb(spark, pdt.DuckDb(con, relation_name="mine"))
    # the user's view is untouched
    assert con.sql("SELECT x FROM mine").fetchone() == (42,)
    # a fresh name still lands and registers
    rel = _export_duckdb(spark, pdt.DuckDb(con, relation_name="fresh"))
    assert rel.fetchall() == [(1, "a"), (2, "b")]
    assert con.sql("SELECT count(*) FROM fresh").fetchone() == (2,)


# ---------------------------------------------------------------------------
# bench.py sentinel gate (VERDICT r10 next #3)
# ---------------------------------------------------------------------------

def test_bench_sentinel_verdict():
    import bench

    quiet = bench._sentinel_verdict({"loadavg": [0.5, 0.4, 0.3]}, 1.05)
    assert quiet["verdict"] == "quiet" and not quiet["reasons"]
    # r10's committed run: loadavg 9.8 at start, p90 spread 1.21 —
    # exactly the evidence shape the gate must now refuse to headline
    r10 = bench._sentinel_verdict({"loadavg": [9.8, 9.0, 8.0]}, 1.21)
    assert r10["verdict"] == "contaminated"
    assert len(r10["reasons"]) == 2
    spread_only = bench._sentinel_verdict({"loadavg": [0.1]}, 1.5)
    assert spread_only["verdict"] == "contaminated"
    missing = bench._sentinel_verdict({}, None)
    assert missing["verdict"] == "quiet"


# ---------------------------------------------------------------------------
# plan-audit baseline reads the committed artifact (VERDICT r10 next #5)
# ---------------------------------------------------------------------------

def test_plan_audit_baseline_matches_committed_artifact():
    """The gate's ceilings must be the newest committed artifact's
    numbers (modulo explicitly-ratified overrides) — the r10 nit was
    exactly that a hand-copied dict and the artifact could drift."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import test_plan_audit as tpa

    for q, m in tpa._ARTIFACT["queries"].items():
        expect = {k: m[k] for k in tpa.GATED}
        expect.update(tpa.RATIFIED.get(q, {}))
        assert tpa.BASELINE[q] == expect, q


# ---------------------------------------------------------------------------
# streaming-ingest hit pairs: Arrow/BLAS lane (r11 — the sf100 stream
# soak measured the interpreted Catalyst cosine join at ~10 min per
# 1000-vector batch against a 2M-vector index; _embedding_hit_pairs now
# auto-routes to a per-(cell, salt-block) BLAS kernel past the
# interpreted-pair budget, same posture as semdedup's pair_backend)
# ---------------------------------------------------------------------------

def _hitpairs_fixture(spark, tmp_path):
    import numpy as np

    base = str(tmp_path / "hp_idx")
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(400, 16)).astype(float)
    # plant exact near-dups: vectors 300..319 duplicate 0..19
    vecs[300:320] = vecs[0:20]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<double>")
    probes = spark.createDataFrame(
        [(1000 + i, [float(x) for x in vecs[300 + i]])
         for i in range(100)],
        "vec_id long, embedding array<double>")
    cents = sim.hyperplanes(16, 4, seed="hitpairs")
    cbs = sim.pq_codebooks(16, m=4, k=8)
    sim.write_ivfpq(corpus, base, cents, cbs, residual=True,
                    store_vectors=True)
    return base, probes


def _hits(spark, base, probes, backend):
    out = sim.embedding_filter_new(
        spark, base, probes, threshold=0.99, n_probe=4,
        probe_margin=None, admit=False, pair_backend=backend)
    return sorted(r["vec_id"] for r in out.select("vec_id").collect())


def test_hit_pairs_numpy_equals_sql(spark, tmp_path):
    base, probes = _hitpairs_fixture(spark, tmp_path)
    s = _hits(spark, base, probes, "sql")
    n = _hits(spark, base, probes, "numpy")
    assert s == n
    # the planted duplicates (probes 1000..1019) must be dropped
    assert set(range(1000, 1020)).isdisjoint(s)
    assert len(s) == 80


def test_hit_pairs_auto_routes_by_budget(spark, tmp_path, monkeypatch):
    base, probes = _hitpairs_fixture(spark, tmp_path)
    meta = sim.read_ivfpq_meta(spark, base)
    probed = sim.assign_cells_multi(
        probes, meta["centroids"], n_probe=4, vec_col="embedding",
        out_col="__cells", probe_margin=None,
    ).select(F.col("vec_id").alias("__pid"),
             F.col("embedding").alias("__pv"),
             F.explode("__cells").alias("cell"))
    small = sim._embedding_hit_pairs(spark, base, meta, probed, 0.99)
    assert "FlatMapGroupsInPandas" not in \
        small._jdf.queryExecution().executedPlan().toString()
    monkeypatch.setattr(sim, "_HIT_PAIR_BUDGET", 10)
    big = sim._embedding_hit_pairs(spark, base, meta, probed, 0.99)
    assert "FlatMapGroupsInPandas" in \
        big._jdf.queryExecution().executedPlan().toString()
    key = lambda r: (r["__pid"], r["__iid"])  # noqa: E731
    assert sorted(map(key, small.collect())) == \
        sorted(map(key, big.collect()))


def test_hit_pairs_numpy_fat_cell_salting(spark, tmp_path, monkeypatch):
    base, probes = _hitpairs_fixture(spark, tmp_path)
    ref = _hits(spark, base, probes, "sql")
    # force every cell through the salted block grid
    monkeypatch.setattr(sim, "_HIT_IDX_BLOCK", 16)
    assert _hits(spark, base, probes, "numpy") == ref


def test_hit_pairs_numpy_edge_probes_survive(spark, tmp_path):
    # NaN-component / dim-mismatched / null probes must SURVIVE in both
    # lanes (no exact cosine can reach the threshold against them)
    base, _ = _hitpairs_fixture(spark, tmp_path)
    bad = spark.createDataFrame(
        [(1, [float("nan")] * 16), (2, [1.0] * 5), (3, None)],
        "vec_id long, embedding array<double>")
    for backend in ("sql", "numpy"):
        out = sim.embedding_filter_new(
            spark, base, bad, threshold=0.5, n_probe=4,
            probe_margin=None, admit=False, pair_backend=backend)
        assert sorted(r["vec_id"] for r in out.collect()) == [1, 2, 3]


def test_hit_pairs_bad_backend_rejected(spark, tmp_path):
    base, probes = _hitpairs_fixture(spark, tmp_path)
    with pytest.raises(ValueError, match="pair_backend"):
        _hits(spark, base, probes, "blas")


def test_write_ivfpq_warns_on_fat_cell(spark, tmp_path):
    import warnings

    import numpy as np

    rng = np.random.default_rng(3)
    # clustered corpus: 1500 copies of one tight cluster + 100 spread
    base = rng.normal(size=16)
    vecs = [base + rng.normal(scale=0.01, size=16) for _ in range(1500)]
    vecs += [rng.normal(size=16) for _ in range(100)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    cents = sim.hyperplanes(16, 8, seed="fatwarn")
    cbs = sim.pq_codebooks(16, m=4, k=8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim.write_ivfpq(df, str(tmp_path / "fat"), cents, cbs)
    assert any("quantizer is not spreading" in str(x.message)
               for x in w), [str(x.message) for x in w]


def test_write_ivfpq_no_warning_when_spread(spark, tmp_path):
    import warnings

    import numpy as np

    rng = np.random.default_rng(4)
    vecs = [[float(x) for x in rng.normal(size=16)] for _ in range(2000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    # centroids sampled from the data itself: Voronoi cells stay
    # reasonably balanced (the shape trained kmeans_fit converges to)
    cents = [vecs[i] for i in range(0, 2000, 250)]
    cbs = sim.pq_codebooks(16, m=4, k=8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim.write_ivfpq(df, str(tmp_path / "ok"), cents, cbs)
    assert not any("quantizer is not spreading" in str(x.message)
                   for x in w), [str(x.message) for x in w]
