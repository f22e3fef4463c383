"""chunk_text edge cases + plan shape: empty docs survive as one empty
chunk, boundaries are exact, overlap works, and the whole thing is a
map-only plan (no Exchange)."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.text import chunk_text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, ""),                     # empty -> one empty chunk
        (1, "abc"),                  # shorter than size -> one chunk
        (2, "a" * 10),               # exactly 2 steps with overlap
        (3, "abcdefghijk"),          # 11 chars
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_boundaries_and_overlap(docs):
    out = (
        chunk_text(docs, "text", size=6, overlap=2)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk))
    assert by_doc[0] == [(0, "")]
    assert by_doc[1] == [(0, "abc")]
    # step=4: starts 0,4,8 for len 10
    assert by_doc[2] == [(0, "aaaaaa"), (1, "aaaaaa"), (2, "aa")]
    # len 11: starts 0,4,8
    assert by_doc[3] == [(0, "abcdef"), (1, "efghij"), (2, "ijk")]


def test_chunks_reassemble_without_overlap(docs):
    out = (
        chunk_text(docs, "text", size=5, overlap=0)
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk")).alias("joined"))
        .collect()
    )
    orig = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        assert r.joined == orig[r.doc_id]


def test_overlap_must_be_smaller_than_size(docs):
    with pytest.raises(ValueError):
        chunk_text(docs, "text", size=5, overlap=5)


def test_chunking_is_map_only_no_shuffle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = chunk_text(df, "text", size=200, overlap=50) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decontaminate_broadcasts_probe(spark, sf_dir):
    """The corpus side of decontamination must not shuffle: the probe
    shingle set broadcasts into a semi-join."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras.dedup import contaminated_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.filter(F.col("doc_id") % 97 == 0)
    plan = contaminated_ids(docs, probe) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # only the final distinct on the (tiny) id set may exchange; the
    # semi-join itself must not sort-merge
    assert "SortMergeJoin" not in plan, plan


def test_repetition_ratio_values(spark):
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),   # "a b c" windows repeat
            (1, "x y z w"),             # all distinct
            (2, ""),                    # empty -> 0.0
            (3, "one two"),             # shorter than k -> one shingle
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.rep for r in df.select(
        "doc_id", repetition_ratio(F.col("text")).alias("rep")).collect()}
    assert out[1] == 0.0 and out[2] == 0.0 and out[3] == 0.0
    # 7 windows, 3 distinct ("a b c","b c a","c a b") -> 1 - 3/7
    assert abs(out[0] - round(1 - 3 / 7, 6)) < 1e-9


def test_segment_words_null_doc_any_ansi_mode(spark, ansi_both):
    """NULL documents must yield [] from segment_words regardless of
    ANSI config (size(NULL) flips between -1/NULL across configs; the
    coalesce guard makes the routing deterministic).  ANSI coverage
    comes from the session-scoped ``ansi_both`` parametrization
    (tests/conftest.py), which runs this test once per mode."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras.text import segment_words

    df = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("a b c d e",)], "t string")
    got = [tuple(r.s) for r in
           df.select(segment_words(F.col("t"), 3).alias("s")).collect()]
    assert got == [(), (), (), ("a b c", "d e")], (ansi_both, got)


def test_remove_repeated_strategies_agree(spark, sf_dir):
    """remove_repeated_segments: the persist-segments (small corpus) and
    two-pass (scalable) strategies return identical documents."""
    from pydiverse_transform_spark.extras.text import (
        remove_repeated_segments,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = remove_repeated_segments(docs, persist_segments=True)
    b = remove_repeated_segments(docs, persist_segments=False)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(a) == rows(b)
