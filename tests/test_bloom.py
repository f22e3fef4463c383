"""Broadcast Bloom-filter prefilter (extras/bloom.py, r11).

Contracts pinned here:
- NO false negatives, ever (the exactness guarantee downstream verify
  joins rely on);
- observed false-positive rate ~= the requested fpp;
- decontaminate(method="bloom") is row-identical to the exact
  broadcast method at any fpp (verify join removes false positives);
- the probe side of bloom_filter_hits is map-only: no Exchange above
  the probed table's scan (the bitmap arrives as a one-row broadcast);
- geometry guard: an over-budget bitmap raises instead of
  driver-materializing gigabytes.
"""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.bloom import (
    BloomFilter,
    bloom_build,
    bloom_filter_hits,
)
from pydiverse_transform_spark.extras.dedup import (
    contaminated_ids,
    decontaminate,
)


@pytest.fixture(scope="module")
def member(spark):
    return spark.range(5000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("s"))


@pytest.fixture(scope="module")
def bloom(member):
    return bloom_build(member, "s", fpp=0.01)


def test_geometry(bloom):
    # m = -n ln p / ln2^2 for n=5000, p=0.01 -> ~47926 bits, word-rounded
    assert bloom.n_items == 5000
    assert bloom.n_bits % 64 == 0
    assert 47_000 <= bloom.n_bits <= 48_500
    assert bloom.n_hashes == 7
    assert bloom.df.count() == 1


def test_no_false_negatives(spark, member, bloom):
    hits = bloom_filter_hits(member, bloom, "s")
    assert member.join(hits, "s", "left_anti").count() == 0


def test_fpp_near_requested(spark, bloom):
    non_member = spark.range(5000, 45000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("s"))
    fp = bloom_filter_hits(non_member, bloom, "s").count()
    observed = fp / 40000
    # 1% requested; allow [0.2%, 3%] (binomial noise at n=40k is tiny,
    # the slack is for geometry rounding)
    assert 0.002 < observed < 0.03, observed


def test_probe_side_never_shuffles(spark, member, bloom):
    big = spark.range(20000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("s"))
    hits = bloom_filter_hits(big, bloom, "s")
    plan = hits._jdf.queryExecution().executedPlan().toString()
    # one broadcast for the bitmap row, and no Exchange anywhere: the
    # probed side is map-only
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.filter(F.col("doc_id") % 97 == 0)
    exact = decontaminate(docs, probe).select("doc_id")
    for fpp in (0.5, 0.01):  # even absurdly-leaky filters stay exact
        bl = decontaminate(docs, probe, method="bloom",
                           fpp=fpp).select("doc_id")
        assert exact.exceptAll(bl).count() == 0
        assert bl.exceptAll(exact).count() == 0


def test_contaminated_ids_bloom_equals_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.filter(F.col("doc_id") % 53 == 0)
    a = contaminated_ids(docs, probe).select("doc_id")
    b = contaminated_ids(docs, probe, method="bloom").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bad_method_rejected(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="broadcast.*bloom|bloom"):
        contaminated_ids(docs, docs.limit(1), method="minhash")


def test_bitmap_budget_guard(spark):
    one = spark.range(1).select(F.col("id").cast("string").alias("s"))
    with pytest.raises(ValueError, match="cap"):
        bloom_build(one, "s", n_items=2_000_000_000, fpp=0.001)
    with pytest.raises(ValueError, match="fpp"):
        bloom_build(one, "s", fpp=1.5)


def test_bloom_deterministic(spark, member):
    a = bloom_build(member, "s", fpp=0.05)
    b = bloom_build(member, "s", fpp=0.05)
    assert isinstance(a, BloomFilter)
    assert a.n_bits == b.n_bits and a.n_hashes == b.n_hashes
    ra = a.df.collect()[0]["__bf"]
    rb = b.df.collect()[0]["__bf"]
    assert ra == rb


def test_contaminated_ids_auto_routes(spark, sf_dir, monkeypatch):
    """method="auto" picks broadcast for a small probe and bloom past
    the crossover (forced here by shrinking the crossover constant to
    zero); both routes return the exact answer."""
    import pydiverse_transform_spark.extras.bloom as bl
    from pydiverse_transform_spark.extras import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.filter(F.col("doc_id") % 53 == 0)
    exact = contaminated_ids(docs, probe).select("doc_id")

    routed = []
    orig_build = bl.bloom_build

    def spy(*a, **kw):
        routed.append("bloom")
        return orig_build(*a, **kw)

    monkeypatch.setattr(bl, "bloom_build", spy)

    # small probe: auto must NOT build a bloom filter
    a = contaminated_ids(docs, probe, method="auto").select("doc_id")
    assert a.exceptAll(exact).count() == 0
    assert exact.exceptAll(a).count() == 0
    assert routed == [], "small probe must take the broadcast lane"

    # crossover forced to 0: auto must take the bloom lane, exactly
    monkeypatch.setattr(dd, "_BLOOM_AUTO_PROBE_BYTES", 0)
    b = contaminated_ids(docs, probe, method="auto").select("doc_id")
    assert routed == ["bloom"], "large probe must take the bloom lane"
    assert b.exceptAll(exact).count() == 0
    assert exact.exceptAll(b).count() == 0
