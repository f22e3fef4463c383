"""The sign-LSH scale path: bucket id materialized as a parquet
partition column must (a) partition-prune at the scan and (b) return the
same results as the full-scan bucket filter."""

import os
import shutil

import pytest

from pydiverse_transform_spark.extras import similarity as sim

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test", "emb_bucketed")

QVEC = [((i * 37) % 101 - 50) / 50.0 for i in range(64)]


@pytest.fixture(scope="module")
def bucketed_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    shutil.rmtree(TMP, ignore_errors=True)
    sim.write_bucketed(emb, TMP, n_planes=4, dim=64)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def test_bucketed_matches_full_scan(spark, sf_dir, bucketed_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = {(r["vec_id"], r["cos_sim"])
            for r in sim.signlsh_topk(emb, QVEC, k=10).collect()}
    bucketed = {(r["vec_id"], r["cos_sim"])
                for r in sim.signlsh_topk_bucketed(
                    spark, bucketed_path, QVEC, k=10).collect()}
    assert full == bucketed


def test_bucketed_scan_partition_prunes(spark, bucketed_path):
    df = sim.signlsh_topk_bucketed(spark, bucketed_path, QVEC, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bucket predicate must appear as a partition filter, not a data
    # filter over all files
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_probe_adjacent_superset(spark, sf_dir, bucketed_path):
    exact = sim.signlsh_topk_bucketed(spark, bucketed_path, QVEC, k=500)
    wider = sim.signlsh_topk_bucketed(spark, bucketed_path, QVEC, k=500,
                                      probe_adjacent=True)
    assert wider.count() >= exact.count()
