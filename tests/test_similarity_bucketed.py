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


# --------------------------------------------------------------------------
# r6: SemDeDup (cell-bounded embedding dedup)
# --------------------------------------------------------------------------

def test_semdedup_pairs_subset_of_brute_force(spark, sf_dir):
    """Every within-cell pair is a true >= threshold pair (precision 1
    by construction: exact cosine verifies candidates); and the
    top-similarity pair of the corpus is found (it co-locates)."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = sim.hyperplanes(64, 16, seed="semdedup")
    pairs = sim.semdedup_pairs(emb, cents, threshold=0.4).collect()
    assert len(pairs) > 0
    from pyspark.sql import functions as F

    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("vb"))
    allp = (
        a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(sim.cosine(F.col("va"), F.col("vb")), 6)
                .alias("c"))
        .filter(F.col("c") >= 0.4)
    )
    want = {(r["id_a"], r["id_b"]): r["c"] for r in allp.collect()}
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in pairs}
    # subset with identical cosines (precision 1; recall is bounded by
    # the quantizer — cross-cell pairs are the documented miss mode,
    # mitigated in production by training the cells on the data)
    for k, v in got.items():
        assert k in want and abs(v - want[k]) < 1e-9


def test_semdedup_keeps_canonical_per_cluster(spark, sf_dir):
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup as dd
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = sim.hyperplanes(64, 16, seed="semdedup")
    kept = {r["vec_id"] for r in
            sim.semdedup(emb, cents, threshold=0.4)
            .select("vec_id").collect()}
    pairs = sim.semdedup_pairs(emb, cents, threshold=0.4)
    comp = dd.connected_components(pairs, "id_a", "id_b")
    losers = {r["node"] for r in
              comp.filter(F.col("node") != F.col("comp")).collect()}
    n = emb.count()
    assert len(losers) > 0
    assert kept == {r["vec_id"] for r in emb.select("vec_id").collect()} - losers
    assert len(kept) == n - len(losers)


def test_semantic_decontaminate_drops_close_corpus_rows(spark, sf_dir):
    """Bipartite contract: a corpus row is dropped iff SOME benchmark
    row shares its cell and reaches the cosine threshold; the benchmark
    side broadcasts (plan-asserted) and the corpus never shuffles."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    cents = sim.hyperplanes(64, 16, seed="semdedup")
    kept = sim.semantic_decontaminate(corpus, bench, cents,
                                      threshold=0.25)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # the probe join broadcasts STATICALLY (bench stats are known); the
    # anti-join's build side is a derived distinct with unknown stats, so
    # its broadcast conversion is AQE's runtime call — statically it is a
    # LeftAnti whose only hash exchanges carry the tiny id relation
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
    import re
    exch = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all("vec_id" in e for e in exch), exch

    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # brute-force twin restricted to shared cells
    cell = sim.kmeans_cell(F.col("embedding"), cents)
    c = corpus.select(F.col("vec_id").alias("ci"),
                      F.col("embedding").alias("cv"),
                      cell.alias("cc"))
    b = bench.select(F.col("embedding").alias("bv"), cell.alias("bc"))
    bad = {
        r["ci"] for r in
        c.crossJoin(b)
        .filter(F.col("cc") == F.col("bc"))
        .filter(F.round(sim.cosine(F.col("cv"), F.col("bv")), 6) >= 0.25)
        .collect()
    }
    all_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    assert len(bad) > 0 and kept_ids == all_ids - bad
