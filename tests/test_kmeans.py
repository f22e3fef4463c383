"""Learned IVF coarse quantizer: distributed Lloyd k-means.

Contracts under test:
- determinism (fixed seeding from the k smallest ids, ties to the lower
  cell id) — two fits are bit-identical;
- the Lloyd invariant — inertia is non-increasing across iterations;
- the two assignment implementations agree (literal-fold `kmeans_cell`
  used by the fit loop vs the broadcast-join `kmeans_assign` used by the
  oracle-checkable step);
- the map-only assignment really is map-only (no Exchange in the plan);
- `ivf_topk(centroids=trained)` at nprobe=n_cells degrades to the exact
  brute-force answer (scan-everything equivalence).
"""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import similarity as sim

QVEC = [((i * 37) % 101 - 50) / 50.0 for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_fit_deterministic(emb):
    a = sim.kmeans_fit(emb, k=4, n_iter=3, dim=64)
    b = sim.kmeans_fit(emb, k=4, n_iter=3, dim=64)
    assert a == b
    assert len(a) == 4 and all(len(c) == 64 for c in a)


def test_inertia_non_increasing(emb):
    inertias = []
    for n_iter in (1, 2, 4):
        cents = sim.kmeans_fit(emb, k=4, n_iter=n_iter, dim=64)
        assigned = emb.select(
            "vec_id",
            sim.kmeans_cell(F.col("embedding"), cents).alias("cid"),
            "embedding",
        )
        # inertia of the FINAL assignment against the final centroids
        d2 = None
        for c, cen in enumerate(cents):
            cur = sim._sq_l2(F.col("embedding"), sim._qlit(cen))
            d2 = cur if d2 is None else F.when(F.col("cid") == c, cur).otherwise(d2)
        total = assigned.agg(F.sum(d2).alias("i")).collect()[0]["i"]
        inertias.append(total)
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-9, inertias


def test_assign_variants_agree(emb):
    seeds_df = sim.kmeans_seed_centroids(emb, k=5)
    cents = [
        [float(v) for v in r["centroid"]]
        for r in seeds_df.orderBy("cid").collect()
    ]
    via_join = {
        (r["vec_id"], r["cid"])
        for r in sim.kmeans_assign(emb, seeds_df).collect()
    }
    via_expr = {
        (r["vec_id"], r["cid"])
        for r in emb.select(
            "vec_id", sim.kmeans_cell(F.col("embedding"), cents).alias("cid")
        ).collect()
    }
    assert via_join == via_expr


def test_assignment_is_map_only(emb):
    cents = [[0.1] * 64, [-0.1] * 64, [0.5] * 64]
    plan = (
        emb.select("vec_id",
                   sim.kmeans_cell(F.col("embedding"), cents).alias("cid"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_update_handles_all_cells(emb):
    seeds_df = sim.kmeans_seed_centroids(emb, k=3)
    assigned = sim.kmeans_assign(emb, seeds_df)
    upd = sim.kmeans_update(assigned).orderBy("cid").collect()
    assert [r["cid"] for r in upd] == [0, 1, 2]
    n_total = emb.count()
    assert sum(r["n_members"] for r in upd) == n_total
    assert all(len(r["centroid"]) == 64 for r in upd)
    assert all(r["inertia"] >= 0 for r in upd)


def test_spherical_centroids_unit_norm(emb):
    cents = sim.kmeans_fit(emb, k=3, n_iter=2, dim=64, spherical=True)
    for c in cents:
        n = sum(v * v for v in c) ** 0.5
        assert abs(n - 1.0) < 1e-9


def test_trained_ivf_full_probe_is_exact(emb):
    cents = sim.kmeans_fit(emb, k=4, n_iter=2, dim=64, spherical=True)
    exact = [(r["vec_id"], r["cos_sim"])
             for r in sim.cosine_topk(emb, QVEC, k=10).collect()]
    ivf = [(r["vec_id"], r["cos_sim"])
           for r in sim.ivf_topk(emb, QVEC, k=10, nprobe=4,
                                 centroids=cents).collect()]
    assert exact == ivf


def test_fit_k_exceeds_rows_raises(spark):
    tiny = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        sim.kmeans_fit(tiny, k=5, dim=2)


# --------------------------------------------------------------------------
# r6: hash-spread farthest-first seeding (kmeans_spread_seeds)
# --------------------------------------------------------------------------

def test_spread_seeds_deterministic_and_distinct(emb):
    a = sim.kmeans_spread_seeds(emb, k=6)
    b = sim.kmeans_spread_seeds(emb, k=6)
    assert a == b
    assert len(a) == 6 and all(len(c) == 64 for c in a)
    # farthest-first guarantees pairwise-distinct seeds when the corpus
    # has >= k distinct vectors
    assert len({tuple(c) for c in a}) == 6


def test_spread_seeding_beats_degenerate_ids(spark, emb):
    """Adversarial id order: ids re-assigned along the first embedding
    coordinate, so the k smallest ids all come from one corner of the
    space (the time-ordered-corpus failure mode).  Spread seeding must
    yield strictly better (or equal) k-means inertia after the same
    number of Lloyd iterations."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("embedding")[0].asc(), F.col("vec_id").asc())
    bad = emb.select(
        F.row_number().over(w).cast("long").alias("vec_id"), "embedding"
    )
    k, n_iter = 8, 3
    cents_spread = sim.kmeans_fit(bad, k=k, n_iter=n_iter, dim=64,
                                  seeding="spread")
    cents_smallest = sim.kmeans_fit(bad, k=k, n_iter=n_iter, dim=64,
                                    seeding="smallest_id")
    i_spread = sim.kmeans_inertia(bad, cents_spread)
    i_smallest = sim.kmeans_inertia(bad, cents_smallest)
    assert i_spread <= i_smallest * 1.001, (i_spread, i_smallest)


def test_seeding_rejects_unknown(emb):
    with pytest.raises(ValueError, match="seeding"):
        sim.kmeans_fit(emb, k=2, n_iter=1, dim=64, seeding="random")


def test_kmeans_inertia_matches_manual(emb):
    cents = sim.kmeans_fit(emb, k=4, n_iter=2, dim=64)
    got = sim.kmeans_inertia(emb, cents)
    assigned = emb.select(
        sim.kmeans_cell(F.col("embedding"), cents).alias("cid"),
        "embedding",
    )
    d2 = None
    for c, cen in enumerate(cents):
        cur = sim._sq_l2(F.col("embedding"), sim._qlit(cen))
        d2 = cur if d2 is None else F.when(F.col("cid") == c, cur).otherwise(d2)
    want = assigned.agg(F.sum(d2).alias("i")).collect()[0]["i"]
    assert abs(got - want) <= 1e-6 * max(1.0, abs(want)), (got, want)
