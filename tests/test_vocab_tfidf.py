"""Vocabulary building and TF-IDF (extras/text.py term_counts /
build_vocab / doc_frequencies / tfidf_top_terms)."""

import math

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "   "),          # whitespace-only: contributes nothing
            (4, None),           # NULL: contributes nothing
            (5, "CAT cat Cat"),  # casefolding collapses to one token
        ],
        "doc_id long, text string",
    )


def test_term_counts(docs):
    counts = {r["token"]: r["tf"] for r in tx.term_counts(docs).collect()}
    assert counts["the"] == 3
    assert counts["cat"] == 4  # 1 from doc 1 + 3 casefolded from doc 5
    assert counts["sat"] == 2
    assert "" not in counts and None not in counts


def test_term_counts_no_lowercase(docs):
    counts = {r["token"]: r["tf"]
              for r in tx.term_counts(docs, lowercase=False).collect()}
    assert counts["CAT"] == 1 and counts["Cat"] == 1 and counts["cat"] == 2


def test_build_vocab_rank_and_pruning(docs):
    vocab = tx.build_vocab(docs, min_count=2).orderBy("rank").collect()
    # only tokens seen >= 2 times survive; rank 1 = most frequent
    assert [r["token"] for r in vocab[:2]] == ["cat", "the"]
    assert all(r["tf"] >= 2 for r in vocab)
    assert [r["rank"] for r in vocab] == list(range(1, len(vocab) + 1))
    top1 = tx.build_vocab(docs, min_count=2, top_n=1).collect()
    assert len(top1) == 1 and top1[0]["token"] == "cat"


def test_doc_frequencies_distinct_per_doc(docs):
    dfreq = {r["token"]: r["df"]
             for r in tx.doc_frequencies(docs).collect()}
    # 'the' appears twice in doc 1 but df counts documents, not tokens
    assert dfreq["the"] == 2
    assert dfreq["cat"] == 2  # docs 1 and 5
    assert dfreq["dog"] == 1


def test_tfidf_formula_and_topk(docs):
    out = tx.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # empty/NULL docs produce no rows
    assert set(by_doc) == {1, 2, 5}
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 5: 'cat' tf=3, df=2, N=5 -> 3 * (ln(6/3) + 1)
    row = by_doc[5][0]
    assert row["token"] == "cat"
    assert abs(row["tfidf"] - 3 * (math.log(6 / 3) + 1)) < 1e-9
    # within a doc, scores are non-increasing
    for rows in by_doc.values():
        scores = [r["tfidf"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_tfidf_rare_term_beats_common(docs):
    out = tx.tfidf_top_terms(docs, k=10)
    doc2 = {r["token"]: r["tfidf"]
            for r in out.filter(F.col("doc_id") == 2).collect()}
    # 'dog' (df=1) must outscore 'the' (df=2) at equal tf
    assert doc2["dog"] > doc2["the"]


def test_vocab_rank_sort_is_post_aggregation(spark, sf_dir):
    """The global rank sorts the aggregated (token, tf) table, never raw
    tokens: the plan's window sits above the final HashAggregate."""
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        tx.build_vocab(real, min_count=2, top_n=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    # exactly one generate (explode) feeding partial aggregation
    assert plan.count("Generate") == 1, plan[:3000]


def test_tfidf_df_pass_dedupes_map_side(spark, sf_dir):
    """The df pass must shuffle only DISTINCT (doc, token) pairs:
    array_distinct sits below the explode in the plan (map-side dedup),
    not a post-explode distinct shuffle."""
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        tx.doc_frequencies(real)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "array_distinct" in plan, plan[:3000]
    # exactly one shuffle keyed on token (the count agg); a post-explode
    # distinct would add a second token-keyed exchange.  (fan_out may
    # add a round-robin repartition on tiny inputs — not token-keyed.)
    assert plan.count("hashpartitioning(token") == 1, plan[:3000]


def test_tfidf_no_driver_side_count(spark, sf_dir):
    """N (corpus size) is a scalar subplan, not a collect: building the
    plan must trigger no Spark job."""
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = tx.tfidf_top_terms(real, k=3)
    _ = df.columns
    after = tracker.getJobIdsForGroup(None)
    assert before == after
