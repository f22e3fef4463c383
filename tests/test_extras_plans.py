"""Plan-regression tests for the beyond-reference join operators:
asof_join must cost exactly ONE hash-partition exchange (the union +
window), and interval_join must plan as a shuffled equi-join — never a
BroadcastNestedLoopJoin/CartesianProduct — with the range predicate as
a residual filter."""

import datetime as dt
import re

from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.asof import asof_join
from pydiverse_transform_spark.extras.interval import interval_join


def _physical(df):
    return df._jdf.queryExecution().toString()


def _events(spark, sf_dir):
    from pydiverse_transform_spark.extras import events as ev

    return ev.load_events(spark, sf_dir)


def test_asof_join_single_shuffle(spark, sf_dir):
    df = _events(spark, sf_dir)
    left = df.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    right = df.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    plan = _physical(asof_join(left, right, on="ts", by=["user_id"]))
    i = plan.find("== Physical Plan ==")
    phys = plan[i:]
    # one exchange for the window partitioning; the union itself is free
    assert len(re.findall(r"Exchange hashpartitioning", phys)) == 1, phys
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_interval_join_is_equi_join_not_nested_loop(spark, sf_dir):
    df = _events(spark, sf_dir)
    clicks = df.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    windows = df.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("w_end"),
    )
    plan = _physical(
        interval_join(clicks, windows, on="ts", start="w_start",
                      end="w_end", by=["user_id"],
                      bucket=dt.timedelta(hours=4))
    )
    i = plan.find("== Physical Plan ==")
    phys = plan[i:]
    assert "CartesianProduct" not in phys, phys
    assert "BroadcastNestedLoopJoin" not in phys, phys
    # the join keys are (user_id, bucket): an equi join (hash or sort-merge)
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                     phys), phys


def test_no_spark_job_at_plan_build_time(spark, sf_dir):
    """Building a plan (any extras operator) must trigger ZERO Spark jobs:
    a hidden driver action like a ``.first()`` dim-sniff would scan a
    100-TB table before the user ever calls an action."""
    from pydiverse_transform_spark.extras import similarity as sim

    sc = spark.sparkContext
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clicks = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )

    before = sc._jsc.sc().dagScheduler().nextJobId()
    # plan-build only — no actions
    sim.embedding_neardup_pairs(emb, threshold=0.9, n_planes=4, dim=64)
    sim.cosine_topk(emb, [0.1] * 64, k=5)
    sim.ivf_topk(emb, [0.1] * 64, k=5, dim=64)
    from pydiverse_transform_spark.extras import dedup

    dedup.minhash_dedup_pairs(docs, n_hashes=8, bands=4)
    interval_join(
        clicks.select("event_id", "user_id", "ts"),
        clicks.select("user_id", "w_start", "w_end"),
        on="ts", start="w_start", end="w_end", by=["user_id"],
        bucket=dt.timedelta(hours=1),
    )
    from pydiverse_transform_spark.extras.asof import asof_join as _asof

    _asof(
        clicks.select("event_id", "user_id", "ts"),
        clicks.select("user_id", "ts", F.col("event_id").alias("rid")),
        on="ts", by=["user_id"],
    )
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after == before, (
        f"{after - before} Spark job(s) ran during plan build"
    )


def test_embedding_neardup_requires_dim():
    import pytest as _pytest

    from pydiverse_transform_spark.extras import similarity as sim

    with _pytest.raises(ValueError, match="dim= is required"):
        sim._require_dim(None, "embedding")


def test_gopher_quality_map_only_single_tokenization(spark, sf_dir):
    """gopher_quality (metric attachment) must stay a map-only pass with
    ONE raw-text tokenization — the staged projection boundary stops
    each higher-order metric from re-splitting the document."""
    from pydiverse_transform_spark.extras import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tx.gopher_quality(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # fan_out's RoundRobin spread of a small scan is fine — what must
    # never appear is a key shuffle (hash/range) for a pure row map
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("split(regexp_replace(text") == 1, plan


def test_gopher_filter_single_tokenization_and_equivalence(spark, sf_dir):
    """gopher_filter's lambda let-binding must keep the pushed-down
    predicate at ONE tokenization (filtering gopher_quality's
    gopher_pass instead inlines the tree and re-splits per rule), and
    the two paths must select the same documents."""
    from pydiverse_transform_spark.extras import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(min_words=10, min_required_words=1)
    filt = tx.gopher_filter(docs, **kw)
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("split(regexp_replace(text") == 1, plan

    # the naive composition really does re-tokenize — the let-binding is
    # load-bearing, not stylistic
    naive = tx.gopher_quality(docs, **kw).filter(F.col("gopher_pass"))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert naive_plan.count("split(regexp_replace(text") > 2

    a = sorted(r["doc_id"] for r in filt.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in naive.select("doc_id").collect())
    assert a == b and 0 < len(a) < docs.count()


def test_pretrain_pipeline_three_shuffles_one_tokenization(spark):
    """The composed pretraining pipeline (gopher gate -> exact dedup ->
    token budget -> deterministic shuffle) must cost exactly its three
    semantic key shuffles (fingerprint, lang, shard) — the gate itself
    adds none — and tokenize the corpus once."""
    import re

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_pretrain_pipeline"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    hashx = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert len(hashx) == 3, hashx
    assert plan.count("split(regexp_replace(text") == 1, plan


def test_pretrain_scored_pipeline_caches_dedup_and_broadcasts_model(
        spark):
    """The model-gated pipeline must (a) persist the deduped corpus —
    it feeds four consumers, and without the cache the gate +
    fingerprint window recompute per consumer — and (b) broadcast the
    LM model tables rather than shuffling the corpus against them."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_pretrain_pipeline_scored"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_scalar_simhash_equals_staged(spark, sf_dir):
    """The lambda-bound scalar simhash must produce exactly the staged
    simhash_df values (it replaced a form that re-tokenized per bit)."""
    from pydiverse_transform_spark.extras import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select("doc_id",
                    dd.simhash(F.col("text"), bits=16).alias("sh"))
    b = dd.simhash_df(docs, "text", "doc_id", bits=16, out_col="sh")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --------------------------------------------------------------------------
# fan_out (r5 advice): the repartition decision now reads Catalyst's free
# sizeInBytes statistic instead of forcing a plan->RDD conversion; the
# observable behavior is unchanged at both sizes
# --------------------------------------------------------------------------

def test_fan_out_small_input_still_spreads(spark, sf_dir):
    from pydiverse_transform_spark.extras.util import fan_out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    out = fan_out(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in plan, plan[:1500]
    assert out.rdd.getNumPartitions() == target


def test_fan_out_large_input_is_noop(spark, sf_dir):
    from pydiverse_transform_spark.extras import util as u

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # force the "large" branch: a 1-byte-per-partition budget means any
    # real input exceeds target*maxPartitionBytes
    orig = u._parse_byte_conf
    u._parse_byte_conf = lambda s: 1
    try:
        out = u.fan_out(docs)
    finally:
        u._parse_byte_conf = orig
    assert out is docs  # no repartition node added at all


def test_fan_out_no_rdd_probe(spark, sf_dir):
    """fan_out must not trigger the RDD-conversion analysis pass."""
    from unittest import mock

    from pydiverse_transform_spark.extras.util import fan_out
    from pyspark.sql import DataFrame

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with mock.patch.object(
        DataFrame, "rdd",
        property(lambda self: (_ for _ in ()).throw(
            AssertionError("fan_out touched df.rdd"))),
    ):
        fan_out(docs)


def test_parse_byte_conf():
    from pydiverse_transform_spark.extras.util import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 134217728
    assert _parse_byte_conf("134217728b") == 134217728
    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("128MB") == 128 << 20
    assert _parse_byte_conf("1g") == 1 << 30


def test_governed_lookup_topk_is_window_group_limit(spark, tmp_path):
    """The governed lookup's top_k row_number cut must physically plan
    as a WindowGroupLimit (Spark 4 rewrites rank-filter windows into a
    partial per-map-task top-k BEFORE the exchange) — the property the
    r12 governed-lane redesign measures but comments alone can't guard
    against a Spark minor-version regression reverting it to a full
    window sort (VERDICT r12 next #4)."""
    from pydiverse_transform_spark.extras import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path, k=3, n_hashes=16, bands=4)
    out = dedup.minhash_index_lookup(
        spark, path, docs.limit(50), threshold=0.2, min_bands=2,
        top_k=3)
    phys = _physical(out)
    i = phys.find("== Physical Plan ==")
    phys = phys[i:]
    assert "WindowGroupLimit" in phys, phys
    # and the rewrite includes the PARTIAL (pre-exchange) instance —
    # Spark prints mode Partial/Final on the two operators
    assert re.search(r"WindowGroupLimit.*Partial", phys), phys
