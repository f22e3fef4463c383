"""Round-8: margin-pruned multi-probe (verdict #4) — coverage of plain
n_probe probing at a fraction of the candidate cost."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import similarity as sim


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_probe_margin_prunes_interior_vectors(spark):
    # two tight clusters far apart: no vector is near a cell boundary,
    # so EVERY second probe is prunable at a small margin
    rows = [(i, [float(i % 7) / 100.0, 0.0]) for i in range(20)] + \
           [(100 + i, [50.0 + float(i % 7) / 100.0, 0.0])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = [[0.0, 0.0], [50.0, 0.0]]
    pruned = sim.assign_cells_multi(df, cents, n_probe=2,
                                    probe_margin=1.0).collect()
    assert all(len(r["__cells"]) == 1 for r in pruned)
    # and a vector ON the boundary keeps both probes
    mid = spark.createDataFrame([(1, [25.0, 0.0])],
                                "vec_id int, embedding array<double>")
    r = sim.assign_cells_multi(mid, cents, n_probe=2,
                               probe_margin=1.0).first()
    assert list(r["__cells"]) == [0, 1]
    # margin=None keeps the unconditional n_probe behavior
    full = sim.assign_cells_multi(df, cents, n_probe=2,
                                  probe_margin=None).collect()
    assert all(len(r["__cells"]) == 2 for r in full)
    with pytest.raises(ValueError, match="probe_margin"):
        sim.assign_cells_multi(df, cents, n_probe=2, probe_margin=-0.5)


def test_probe_margin_keeps_boundary_pair_coverage(spark):
    # a near-dup pair straddling a cell boundary: margin-pruned
    # n_probe=2 must still recover it (the r7 motivation case)
    rows = [(1, [24.9, 0.0]), (2, [25.1, 0.0]),   # boundary pair
            (3, [1.0, 0.0]), (4, [49.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = [[0.0, 0.0], [50.0, 0.0]]
    got = {(r["id_a"], r["id_b"])
           for r in sim.semdedup_pairs(
               df, cents, threshold=0.99, n_probe=2,
               probe_margin=2.0).collect()}
    assert (1, 2) in got
    # single-probe misses it (1 lands in cell 0, 2 in cell 1)
    miss = {(r["id_a"], r["id_b"])
            for r in sim.semdedup_pairs(df, cents,
                                        threshold=0.99).collect()}
    assert (1, 2) not in miss


def test_semdedup_auto_margin_matches_unpruned_on_corpus(spark, sf_dir):
    """On the real embeddings table the auto margin must keep every
    pair unconditional n_probe=2 probing finds (the corpus' near-dup
    distances are far inside the auto margin)."""
    emb = _emb(spark, sf_dir)
    cents = sim.kmeans_spread_seeds(emb, 8)
    unpruned = {(r["id_a"], r["id_b"])
                for r in sim.semdedup_pairs(
                    emb, cents, threshold=0.2, n_probe=2,
                    probe_margin=None).collect()}
    auto = {(r["id_a"], r["id_b"])
            for r in sim.semdedup_pairs(
                emb, cents, threshold=0.2, n_probe=2,
                probe_margin="auto").collect()}
    assert auto == unpruned and len(auto) > 0
    # and a tight margin visibly prunes probe volume on this corpus
    n_pruned = sim.assign_cells_multi(
        emb.select("vec_id", "embedding"), cents, n_probe=2,
        probe_margin=0.2,
    ).select(F.sum(F.size("__cells")).alias("s")).first()["s"]
    n_full = emb.count() * 2
    assert n_pruned < n_full
