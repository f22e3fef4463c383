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


def test_directed_probe_coverage_theorem(spark):
    """The triangle-inequality guarantee behind directed probing, as a
    property: with n_probe = k (the cap never binds) and probe_margin =
    2 * max pair distance, directed multi-probe blocking recovers EVERY
    pair with cosine >= threshold that brute force finds — for any
    corpus/centroid geometry (here: several deterministic adversarial
    layouts, incl. clusters split by cell boundaries)."""
    import itertools
    import math
    import random

    rng = random.Random(1138)
    layouts = []
    # clustered: tight blobs whose centers straddle centroid boundaries
    for trial in range(3):
        cents = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(5)]
        rows = []
        vid = 0
        for _ in range(6):
            cx = [rng.uniform(-1, 1) for _ in range(4)]
            for _ in range(4):
                rows.append((vid, [c + rng.uniform(-0.05, 0.05)
                                   for c in cx]))
                vid += 1
        layouts.append((rows, cents))
    for rows, cents in layouts:
        df = spark.createDataFrame(rows,
                                   "vec_id int, embedding array<double>")
        th = 0.95

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb) if na and nb else 0.0

        vecs = dict(rows)
        truth = {(i, j)
                 for (i, _), (j, _) in itertools.combinations(rows, 2)
                 if round(cos(vecs[i], vecs[j]), 6) >= th}
        if not truth:
            continue
        dmax = max(
            math.sqrt(sum((x - y) ** 2
                          for x, y in zip(vecs[i], vecs[j])))
            for i, j in truth)
        got = {(r["id_a"], r["id_b"])
               for r in sim.semdedup_pairs(
                   df, cents, threshold=th, n_probe=len(cents),
                   probe_margin=2.0 * dmax + 1e-9).collect()}
        assert truth <= got, (sorted(truth - got), dmax)
