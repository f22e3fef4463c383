"""Round-15 optimization pins: shared celled pass in semdedup (one
assignment pass serves the routing probe and the winning route, cache
released), the bounded CC sizing probe, and the gram-table release."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import similarity as sim


def _persistent_rdd_ids(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _vec_parquet(spark, tmp_path, name="vecs"):
    """Parquet-backed vector table (createDataFrame alone has unknown
    Catalyst stats, which would bypass the small-corpus persist gate
    the test exists to exercise)."""
    rows = []
    # two obvious clusters of exact duplicates plus singletons
    for i in range(4):
        rows.append((i, [1.0, 0.0, 0.0, 0.0]))
    for i in range(4, 7):
        rows.append((i, [0.0, 1.0, 0.0, 0.0]))
    rows.append((7, [0.0, 0.0, 1.0, 0.0]))
    rows.append((8, [0.0, 0.0, 0.0, 1.0]))
    path = str(tmp_path / name)
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_semdedup_shared_celled_pass_releases_cache(spark, tmp_path):
    """semdedup's auto route persists the celled projection once (probe
    + pair lane share the assignment pass) and releases it before
    returning; survivors are the minimum id of each duplicate
    cluster."""
    df = _vec_parquet(spark, tmp_path)
    cents = sim.hyperplanes(4, 4, seed="r15-celled")

    before = _persistent_rdd_ids(spark)
    kept = sim.semdedup(df, cents, threshold=0.95,
                        assign_method="numpy")
    ids = sorted(r.vec_id for r in kept.select("vec_id").collect())
    # exact-duplicate clusters {0..3} and {4..6} keep their minimum
    assert ids == [0, 4, 7, 8]
    assert _persistent_rdd_ids(spark) - before == set()


def test_semdedup_cells_route_releases_cache(spark, tmp_path,
                                             monkeypatch):
    """When the probe routes to the in-kernel cells lane (lazy
    consumers), the shared cache is released immediately — no pinned
    RDD may outlive the call even before the result materializes."""
    df = _vec_parquet(spark, tmp_path, name="vecs_cells")
    cents = sim.hyperplanes(4, 4, seed="r15-celled")
    monkeypatch.setattr(sim, "_COMPONENT_PAIR_CAP", 0)

    before = _persistent_rdd_ids(spark)
    kept = sim.semdedup(df, cents, threshold=0.95,
                        assign_method="numpy")
    assert _persistent_rdd_ids(spark) - before == set()
    ids = sorted(r.vec_id for r in kept.select("vec_id").collect())
    assert ids == [0, 4, 7, 8]
    assert _persistent_rdd_ids(spark) - before == set()
