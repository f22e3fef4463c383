"""Naive Bayes text classifier (extras/classify.py): separability on
the lang labels, determinism, and the broadcast-model plan shape."""

from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import classify as cl


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_nb_separates_training_classes(spark, sf_dir):
    """English-labeled documents must score higher on average than the
    rest when trained on that very split (in-sample separability — the
    weakest property a working classifier must have)."""
    docs = _docs(spark, sf_dir)
    w = cl.nb_train(docs, F.col("lang") == "en")
    scored = cl.nb_score(docs, w).join(
        docs.select("doc_id", "lang"), "doc_id")
    means = dict(
        scored.groupBy(F.col("lang") == "en")
        .agg(F.avg("nb_score").alias("m")).collect()
    )
    assert means[True] > means[False]


def test_nb_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted(map(tuple, cl.nb_train(
        docs, F.col("lang") == "en").collect()))
    b = sorted(map(tuple, cl.nb_train(
        docs, F.col("lang") == "en").collect()))
    assert a == b and len(a) > 10


def test_nb_score_broadcasts_model(spark, sf_dir):
    """The weights table must broadcast into the scoring join — a
    shuffled join would move the 100-TB corpus for a kilobyte-scale
    model."""
    docs = _docs(spark, sf_dir)
    w = cl.nb_train(docs, F.col("lang") == "en")
    plan = cl.nb_score(docs, w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_nb_min_doc_freq_prunes_vocab(spark):
    df = spark.createDataFrame(
        [(1, "common rare1", "en"), (2, "common", "en"),
         (3, "common rare2", "de"), (4, "common", "de")],
        "doc_id long, text string, lang string")
    full = {r["token"] for r in cl.nb_train(
        df, F.col("lang") == "en").collect()}
    pruned = {r["token"] for r in cl.nb_train(
        df, F.col("lang") == "en", min_doc_freq=2).collect()}
    assert full == {"common", "rare1", "rare2"} and pruned == {"common"}


def test_nb_empty_and_null_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "the cat", "en"), (2, "", "en"), (3, None, "de"),
         (4, "der hund", "de")],
        "doc_id long, text string, lang string")
    w = cl.nb_train(df, F.col("lang") == "en")
    ids = {r["doc_id"] for r in cl.nb_score(df, w).collect()}
    assert ids == {1, 4}
