"""DSIR-style importance weighting + Gumbel top-k + temperature mixing
(extras/importance.py): determinism, Python/Spark twin agreement,
proportional-sampling semantics, plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import importance as imp


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# featurization
# --------------------------------------------------------------------------

def _py_buckets(text, n_buckets, bigrams=True):
    import hashlib
    import re

    toks = re.sub(r"^\s+|\s+$", "", (text or "")).lower()
    toks = re.split(r"\s+", toks)

    def b(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    out = [b(w) for w in toks]
    if bigrams:
        out += [b(f"{a} {c}") for a, c in zip(toks, toks[1:])]
    return out


def test_hashed_ngram_buckets_matches_python_twin(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(30)
    rows = docs.select(
        "text",
        imp.hashed_ngram_buckets(F.col("text"), 256).alias("bs"),
    ).collect()
    for r in rows:
        assert list(r["bs"]) == _py_buckets(r["text"], 256), r["text"][:60]


def test_hashed_ngram_buckets_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "  ")],
                               "id int, text string")
    rows = {r.id: list(r.bs) for r in df.select(
        "id", imp.hashed_ngram_buckets(F.col("text"), 64).alias("bs")
    ).collect()}
    # NULL == empty == whitespace-only: one empty-token unigram, no bigram
    assert rows[1] == rows[2] == rows[3]
    assert len(rows[1]) == 1


# --------------------------------------------------------------------------
# distribution + weights
# --------------------------------------------------------------------------

def test_bucket_counts_total_is_gram_instances(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    counts = imp.bucket_counts(docs, n_buckets=512)
    assert len(counts) == 512
    rows = docs.select("text").collect()
    want = sum(len(_py_buckets(r["text"], 512)) for r in rows)
    assert sum(counts) == want


def test_log_ratio_and_weight_python_twin(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")
    nb = 256
    t = imp.bucket_counts(target, n_buckets=nb)
    r = imp.bucket_counts(docs, n_buckets=nb)
    lut = imp.log_ratio_table(t, r)
    got = {
        row["doc_id"]: row["w"]
        for row in docs.limit(20).select(
            "doc_id",
            imp.importance_weight(F.col("text"), lut).alias("w"),
        ).collect()
    }
    for row in docs.limit(20).collect():
        want = sum(lut[b] for b in _py_buckets(row["text"], nb))
        assert abs(got[row["doc_id"]] - want) < 1e-9


def test_dsir_weights_scoring_is_map_only(spark, sf_dir):
    """The scoring pass must be join-free and shuffle-free: the LUT is
    a literal in the plan (model broadcasts implicitly as code)."""
    docs = _docs(spark, sf_dir)
    out = imp.dsir_weights(docs, docs.filter(F.col("lang") == "en"),
                           n_buckets=128)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_dsir_weights_favor_target_like_docs(spark, sf_dir):
    """English docs must on average score higher than non-English when
    the target corpus is the English subset (the DSIR point)."""
    docs = _docs(spark, sf_dir)
    out = imp.dsir_weights(docs, docs.filter(F.col("lang") == "en"),
                           n_buckets=2048)
    rows = (
        out.groupBy(F.col("lang") == "en")
        .agg(F.avg(F.col("dsir_weight") /
                   F.greatest(F.col("n_chars"), F.lit(1))).alias("a"))
        .collect()
    )
    m = {bool(r[0]): float(r["a"]) for r in rows}
    assert m[True] > m[False], m


# --------------------------------------------------------------------------
# gumbel top-k
# --------------------------------------------------------------------------

def test_gumbel_topk_deterministic_and_sized(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn("w", F.lit(0.0))
    a = [r.doc_id for r in imp.gumbel_topk(docs, "w", 25, "doc_id",
                                           salt="s1").collect()]
    b = [r.doc_id for r in imp.gumbel_topk(docs, "w", 25, "doc_id",
                                           salt="s1").collect()]
    c = [r.doc_id for r in imp.gumbel_topk(docs, "w", 25, "doc_id",
                                           salt="s2").collect()]
    assert a == b and len(a) == 25
    assert set(a) != set(c)  # salt draws an independent sample


def test_gumbel_topk_proportional_to_exp_weight(spark):
    """Rows with weight ln(9) must be drawn ~9x as often as weight 0
    rows: chi-square-free sanity via a generous band."""
    rows = [(i, math.log(9.0) if i < 500 else 0.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    kept = imp.gumbel_topk(df, "w", 200, "id", salt="prop")
    n_heavy = kept.filter(F.col("id") < 500).count()
    # E[heavy] ~ 200 * 9/10 = 180
    assert 155 <= n_heavy <= 200, n_heavy


def test_gumbel_topk_per_group(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn("w", F.lit(0.0))
    out = imp.gumbel_topk(docs, "w", 5, "doc_id",
                          partition_by=["lang"])
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    for lang, n in sizes.items():
        assert n == min(5, full[lang]), (lang, n)


# --------------------------------------------------------------------------
# temperature mixing
# --------------------------------------------------------------------------

def test_temperature_mix_rates_math():
    counts = {"a": 9000, "b": 900, "c": 100}
    r1 = imp.temperature_mix_rates(counts, alpha=1.0)
    assert all(abs(v - r1["a"]) < 1e-12 for v in r1.values())
    r0 = imp.temperature_mix_rates(counts, alpha=0.3)
    # alpha<1 upweights small sources relative to large ones
    assert r0["c"] > r0["a"]
    # expected kept total == N when target_total unset (before capping)
    exp_total = sum(r0[s] * counts[s] for s in counts)
    assert exp_total <= sum(counts.values()) + 1e-6


def test_temperature_mix_lazy_and_rebalances(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    out = imp.temperature_mix(docs, "source", "doc_id", alpha=0.3)
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after == before, "temperature_mix ran a job at plan build"

    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    # the python-side rate math predicts the per-source expectation
    rates = imp.temperature_mix_rates(full, alpha=0.3)
    for s, n_full in full.items():
        want = rates[s] * n_full
        got = kept.get(s, 0)
        assert abs(got - want) <= max(6, 4 * (want ** 0.5)), (s, got, want)
    # rebalance direction: smallest source keeps a larger share
    small = min(full, key=full.get)
    big = max(full, key=full.get)
    assert kept[small] / full[small] >= kept.get(big, 0) / full[big]


def test_temperature_mix_alpha_one_keeps_uniform_rate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = imp.temperature_mix(docs, "source", "doc_id", alpha=1.0)
    # alpha=1, target_total=N => every rate is exactly 1 => no row drops
    assert out.count() == docs.count()


def test_rejects_bad_alpha(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="alpha"):
        imp.temperature_mix(docs, "source", "doc_id", alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        imp.temperature_mix_rates({"a": 1}, alpha=-1)


def test_dsir_weights_column_target_matches_dataframe_target(spark, sf_dir):
    """The single-pass Column-target form must produce identical
    weights to the general two-pass DataFrame-target form."""
    docs = _docs(spark, sf_dir)
    two_pass = imp.dsir_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=512)
    one_pass = imp.dsir_weights(
        docs, F.col("lang") == "en", n_buckets=512)
    a = {r["doc_id"]: r["dsir_weight"] for r in two_pass.collect()}
    b = {r["doc_id"]: r["dsir_weight"] for r in one_pass.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12, k


def test_dsir_scoring_runs_on_a_stream(spark, sf_dir, tmp_path):
    """The scoring pass is a pure map (literal LUT, no join/shuffle),
    so a trained model applies unmodified to a document STREAM — the
    online-filtering deployment shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = imp.bucket_counts(docs.filter(F.col("lang") == "en"),
                          n_buckets=256)
    r = imp.bucket_counts(docs, n_buckets=256)
    lut = imp.log_ratio_table(t, r)

    src = str(tmp_path / "docstream")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    scored = stream.select(
        "doc_id",
        F.round(imp.importance_weight(F.col("text"), lut), 6).alias("w"),
    )
    q = (scored.writeStream.format("memory")
         .queryName("dsir_stream_test")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r_["doc_id"]: r_["w"] for r_ in
           spark.sql("SELECT * FROM dsir_stream_test").collect()}
    want = {r_["doc_id"]: r_["w"] for r_ in docs.select(
        "doc_id",
        F.round(imp.importance_weight(F.col("text"), lut), 6).alias("w"),
    ).collect()}
    assert got == want and len(got) == docs.count()
