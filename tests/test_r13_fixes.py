"""Round-13 fixes.

- substring_dedup sort lane: the spill-aware occurrence spread
  (:func:`dedup._spansort_spread`) must (a) leave results identical,
  (b) REPLACE the window's implicit exchange rather than adding one,
  and (c) leave small-corpus plans byte-identical (want <= session
  default -> no repartition).
"""
from __future__ import annotations

import re

from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import dedup

SF = "/root/testdata/sf0.001"


def _clean_rows(df):
    return sorted(
        (r["doc_id"], r["clean_text"], r["n_tokens_after"])
        for r in df.select("doc_id", "clean_text",
                           "n_tokens_after").collect())


def test_spansort_spread_identical_results(spark, monkeypatch):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = _clean_rows(dedup.substring_dedup(
        docs, "text", "doc_id", window=8, dup_strategy="sort"))
    # force the spread ON for this tiny corpus: huge factor, tiny task
    monkeypatch.setattr(dedup, "_SPAN_OCC_BYTES_PER_PLAN_BYTE",
                        1 << 20)
    monkeypatch.setattr(dedup, "_SPAN_SORT_TASK_BYTES", 1 << 20)
    spread = _clean_rows(dedup.substring_dedup(
        docs, "text", "doc_id", window=8, dup_strategy="sort"))
    assert spread == base


def test_spansort_spread_replaces_window_exchange(spark, monkeypatch):
    """With the spread engaged, the occurrence window's plan holds
    exactly ONE hash exchange (the explicit repartition on h satisfies
    the window's clustered distribution — EnsureRequirements must not
    add a second), carrying the chosen partition count."""
    from pyspark.sql import Window as W

    monkeypatch.setattr(dedup, "_SPAN_OCC_BYTES_PER_PLAN_BYTE",
                        1 << 20)
    monkeypatch.setattr(dedup, "_SPAN_SORT_TASK_BYTES", 1 << 20)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    occ = dedup._spansort_spread(
        docs, dedup.span_occurrences(docs, "text", "doc_id", window=8))
    wh = W.partitionBy("h")
    wr = W.partitionBy("h").orderBy("doc_id", "pos")
    bad = (occ.withColumn("__cnt", F.count("*").over(wh))
           .withColumn("__rn", F.row_number().over(wr))
           .filter((F.col("__cnt") >= 2) & (F.col("__rn") > 1)))
    phys = bad._jdf.queryExecution().executedPlan().toString()
    phys = phys.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning\(h#", phys)) \
        == 1, phys


def test_spansort_spread_noop_below_default(spark):
    """Small corpora (want <= spark.sql.shuffle.partitions) keep the
    r12 plan: no RepartitionByExpression appears."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    occ = dedup._spansort_spread(
        docs, dedup.span_occurrences(docs, "text", "doc_id", window=8))
    assert "RepartitionByExpression" not in \
        occ._jdf.queryExecution().optimizedPlan().toString()


def test_decon_method_resolver(spark):
    """_resolve_decon_method is the single routing source of truth:
    explicit methods pass through, auto routes small probes to
    broadcast, and unknown names raise."""
    import pytest

    probe = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    assert dedup._resolve_decon_method("broadcast", probe) \
        == "broadcast"
    assert dedup._resolve_decon_method("bloom", probe) == "bloom"
    assert dedup._resolve_decon_method("auto", probe) == "broadcast"
    with pytest.raises(ValueError, match="method"):
        dedup._resolve_decon_method("guess", probe)
