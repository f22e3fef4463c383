"""Round-9 fixes: the r8 VERDICT punch list + ADVICE findings.

- id-column cast matrix for ``_check_integral_narrowing`` (ADVICE:
  integral→floating precision loss for ids)
- admit-lane null/NaN edge tests live in test_minhash_index.py /
  test_streaming.py siblings; the skew routing and IVF compaction
  tests are added alongside their features below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pydiverse_transform_spark.extras.similarity import (
    _check_integral_narrowing,
)


@pytest.mark.parametrize("src,dst,id_col,ok", [
    # integral narrowing: refused regardless of id-ness
    (T.LongType(), T.IntegerType(), False, False),
    (T.LongType(), T.IntegerType(), True, False),
    (T.IntegerType(), T.ShortType(), True, False),
    # widening / same width: fine
    (T.IntegerType(), T.LongType(), True, True),
    (T.LongType(), T.LongType(), True, True),
    # integral -> floating, NON-id column (vector alignment): allowed
    (T.LongType(), T.DoubleType(), False, True),
    (T.LongType(), T.FloatType(), False, True),
    # integral -> floating, id column: allowed only within the float
    # type's exact-integer range (double exact to 2^53 covers int,
    # not long; float exact to 2^24 covers short, not int)
    (T.IntegerType(), T.DoubleType(), True, True),
    (T.ShortType(), T.FloatType(), True, True),
    (T.ByteType(), T.FloatType(), True, True),
    (T.LongType(), T.DoubleType(), True, False),
    (T.IntegerType(), T.FloatType(), True, False),
    (T.LongType(), T.FloatType(), True, False),
    # float -> float narrowing stays allowed everywhere (the intended
    # double-vectors-into-float-index alignment)
    (T.DoubleType(), T.FloatType(), False, True),
    (T.DoubleType(), T.FloatType(), True, True),
    # floating -> integral, id column: refused (truncation/wrap
    # collides ids — review finding r9); non-id columns untouched
    (T.DoubleType(), T.LongType(), True, False),
    (T.FloatType(), T.IntegerType(), True, False),
    (T.DoubleType(), T.LongType(), False, True),
    # strings etc. are not this guard's business
    (T.StringType(), T.DoubleType(), True, True),
])
def test_id_cast_guard_matrix(src, dst, id_col, ok):
    if ok:
        _check_integral_narrowing(src, dst, "c", id_col=id_col)
    else:
        with pytest.raises(ValueError):
            _check_integral_narrowing(src, dst, "c", id_col=id_col)


# ---------------------------------------------------------------------------
# r9 (VERDICT next #7): null/NaN edge lane through the INGEST (admit)
# path of both incremental dedup ops — survivors AND index contents
# ---------------------------------------------------------------------------

def test_embedding_filter_new_admit_edge_lane(spark, tmp_path):
    """Null / NaN / null-element / dim-mismatched vectors SURVIVE the
    ingest filter (nothing can near-dup them) but are never admitted
    into the index: no junk cell=__HIVE_DEFAULT_PARTITION__ dir, no
    forever-unmatchable candidate rows."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.hyperplanes(64, 4, seed="edge9")
    cbs = sim.pq_codebooks(64, m=4, k=8)
    path = str(tmp_path / "idx")
    sim.write_ivfpq(emb, path, cents, cbs, residual=True)
    n0 = spark.read.parquet(path).count()
    nan = float("nan")
    inc = spark.createDataFrame(
        [(9001, None),                      # null vector
         (9002, [nan] * 64),                # all-NaN
         (9003, [0.5] * 3),                 # dim mismatch
         (9004, [1.0] + [0.0] * 63),        # novel valid
         (9005, [0.1, nan] + [0.0] * 62),   # NaN component
         (9006, [0.1, None] + [0.0] * 62)],  # null element
        "vec_id long, embedding array<double>")
    surv = sim.embedding_filter_new(spark, path, inc, threshold=0.95,
                                    n_probe=1, probe_margin=None,
                                    admit=True)
    assert sorted(r["vec_id"] for r in surv.collect()) \
        == [9001, 9002, 9003, 9004, 9005, 9006]
    idx = spark.read.parquet(path)
    added = {r["vec_id"]: r["cell"] for r in
             idx.filter(F.col("vec_id") >= 9000).collect()}
    # ONLY the matchable survivor was indexed
    assert list(added) == [9004] and added[9004] is not None
    assert idx.count() == n0 + 1
    assert idx.filter(F.col("cell").isNull()).count() == 0
    import os
    assert not any("HIVE_DEFAULT" in d for d in os.listdir(path))
    # and a later identical arrival near-dups the admitted one
    inc2 = spark.createDataFrame([(9104, [1.0] + [0.0] * 63)],
                                 "vec_id long, embedding array<double>")
    surv2 = sim.embedding_filter_new(spark, path, inc2, threshold=0.95,
                                     n_probe=1, probe_margin=None)
    assert surv2.count() == 0


def test_semantic_ingest_stream_admit_edge_lane(spark, tmp_path):
    """The streaming twin keeps the same contract per micro-batch."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark import streaming as st
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.hyperplanes(64, 4, seed="edge9s")
    cbs = sim.pq_codebooks(64, m=4, k=8)
    idx = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    sim.write_ivfpq(emb, idx, cents, cbs, residual=True)
    n0 = spark.read.parquet(idx).count()
    nan = float("nan")
    inc = spark.createDataFrame(
        [(9001, None), (9002, [nan] * 64), (9003, [0.5] * 3),
         (9004, [1.0] + [0.0] * 63),
         (9005, [0.1, nan] + [0.0] * 62)],
        "vec_id long, embedding array<double>")
    inc.coalesce(1).write.parquet(src)
    stream = st.read_event_stream(spark, src,
                                  schema=spark.read.parquet(src).schema)
    q = st.semantic_ingest_stream(
        stream, idx, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        threshold=0.95, n_probe=1, probe_margin=None, admit=True,
        available_now=True)
    assert q.awaitTermination(180)
    surv = {r["vec_id"] for r in
            spark.read.parquet(str(tmp_path / "out")).collect()}
    assert surv == {9001, 9002, 9003, 9004, 9005}
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == n0 + 1
    assert idx_df.filter(F.col("cell").isNull()).count() == 0
    added = [r["vec_id"] for r in
             idx_df.filter(F.col("vec_id") >= 9000).collect()]
    assert added == [9004]


def test_neardup_filter_new_admit_edge_lane(spark, tmp_path):
    """Null / empty / whitespace-only text through the ingest lane
    keeps BATCH PARITY: empty docs carry the sentinel empty-shingle
    signature, so they estimate jaccard 1.0 against each other — the
    batch op (``neardup_dedup``) keeps the first and drops the rest,
    and the incremental lane must behave the same across increments:
    the first indexed empty doc drops every later empty arrival."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "an entirely different document about spark engines")],
        "doc_id long, text string")
    path = str(tmp_path / "midx")
    dedup.write_minhash_index(docs, path)
    inc = spark.createDataFrame(
        [(9001, None),
         (9002, ""),
         (9003, "   \t  "),
         (9004, "the quick brown fox jumps over the lazy dog today"),
         (9005, "totally novel words nobody indexed before now ok")],
        "doc_id long, text string")
    surv = dedup.neardup_filter_new(spark, path, inc, threshold=0.7,
                                    admit=True)
    got = sorted(r["doc_id"] for r in surv.collect())
    # 9004 near-dups indexed doc 1 and drops; the filter only compares
    # against the INDEX, so the increment's empties all survive (no
    # empty doc was indexed yet) and are admitted
    assert got == [9001, 9002, 9003, 9005]
    idx = spark.read.parquet(path)
    appended = sorted(r["doc_id"] for r in
                      idx.filter(F.col("doc_id") >= 9000)
                      .select("doc_id").distinct().collect())
    assert appended == [9001, 9002, 9003, 9005]
    # batch parity across increments: a LATER empty/null/whitespace
    # arrival estimates jaccard 1.0 vs the indexed sentinel and drops —
    # exactly what neardup_dedup does within one batch (keep-first)
    inc2 = spark.createDataFrame(
        [(9101, ""), (9102, None), (9103, " \t "),
         (9105, "totally novel words nobody indexed before now ok"),
         (9106, "words never seen by any index increment before")],
        "doc_id long, text string")
    surv2 = dedup.neardup_filter_new(spark, path, inc2, threshold=0.7)
    assert sorted(r["doc_id"] for r in surv2.collect()) == [9106]
    # the single-batch twin agrees: all empties collapse onto the first
    batch_kept = dedup.neardup_dedup(
        spark.createDataFrame(
            [(1, ""), (2, None), (3, "   "), (4, "real words here ok")],
            "doc_id long, text string"), threshold=0.7)
    assert sorted(r["doc_id"] for r in batch_kept.collect()) == [1, 4]


# ---------------------------------------------------------------------------
# r9: fat-cell block decomposition for semdedup_pairs — EXACT pair
# parity with the plain join, across both probe lanes, plus actual
# multi-key distribution of a forced fat cell
# ---------------------------------------------------------------------------

def _emb9(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.mark.parametrize("n_probe", [1, 2])
def test_blocked_pairs_exact_parity(spark, n_probe):
    from pydiverse_transform_spark.extras import similarity as sim

    emb = _emb9(spark)
    cents = sim.hyperplanes(64, 4, seed="blk")  # few cells => all fat
    kw = dict(threshold=0.2, n_probe=n_probe, probe_margin=None,
              assign_method="numpy")
    plain = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in
        sim.semdedup_pairs(emb, cents, cell_task_cap=None,
                           **kw).collect())
    blocked = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in
        sim.semdedup_pairs(emb, cents, cell_task_cap=20,
                           **kw).collect())
    assert len(plain) > 0
    assert blocked == plain
    # a cap larger than every cell leaves the plain path (no blocks)
    untouched = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in
        sim.semdedup_pairs(emb, cents, cell_task_cap=10**9,
                           **kw).collect())
    assert untouched == plain


def test_blocked_pairs_distribute_fat_cell(spark):
    """The decomposition's point: one fat cell's pair space becomes
    MANY join keys (t x t triangle blocks), so the quadratic work can
    spread over tasks instead of serializing on one."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim
    from pydiverse_transform_spark.extras.similarity import (
        _blocked_pair_join, _fat_cell_tmap,
    )

    emb = _emb9(spark)
    one_cell = [[0.0] * 64]  # every vector lands in cell 0
    celled = sim.assign_cells(emb, one_cell, method="numpy")
    tmap = _fat_cell_tmap(celled, cap=50)   # 500 rows -> t = 10
    assert tmap is not None
    got_t = tmap.collect()
    assert [(r["__cell"], r["__t"]) for r in got_t] == [(0, 10)]
    a = celled.select("__cell", F.col("vec_id").alias("id_a"))
    b = celled.select("__cell", F.col("vec_id").alias("id_b"))
    joined = _blocked_pair_join(a, b, tmap, symmetric=True)
    pairs = joined.filter(
        (F.col("__bi") < F.col("__bj"))
        | (F.col("id_a") < F.col("id_b")))
    # triangle block count: t*(t+1)/2 = 55 distinct join keys
    n_blocks = pairs.select("__bi", "__bj").distinct().count()
    assert n_blocks == 55
    # and exactness at the raw-pair level: C(500, 2) unordered pairs
    canon = pairs.select(
        F.least("id_a", "id_b").alias("a"),
        F.greatest("id_a", "id_b").alias("b")).distinct()
    n = emb.count()
    assert pairs.count() == n * (n - 1) // 2   # no duplicates at all
    assert canon.count() == n * (n - 1) // 2


@pytest.mark.parametrize("cap", [None, 20])
def test_numpy_pair_backend_parity(spark, cap):
    """The BLAS pair kernel must return the SAME pairs and cosines as
    the codegen sql path — with and without the fat-cell block grid —
    on real embeddings (last-ulp rounding-boundary divergence is the
    only documented escape, and real data does not sit on 5e-7
    boundaries)."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = _emb9(spark)
    cents = sim.hyperplanes(64, 4, seed="blk")
    kw = dict(threshold=0.2, assign_method="numpy")

    def run(backend):
        return sorted(
            (r["id_a"], r["id_b"], r["cos_sim"]) for r in
            sim.semdedup_pairs(emb, cents, cell_task_cap=cap,
                               pair_backend=backend, **kw).collect())

    sql_pairs = run("sql")
    np_pairs = run("numpy")
    assert len(sql_pairs) > 0
    assert np_pairs == sql_pairs


def test_pair_backend_auto_and_validation(spark):
    """auto == sql when no cell is fat (byte-identical result, and the
    sf0.01 driver-gate path), numpy when one is; numpy rejects the
    multi-probe lane."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = _emb9(spark)
    cents = sim.hyperplanes(64, 4, seed="blk")
    auto_fat = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in
        sim.semdedup_pairs(emb, cents, threshold=0.2, cell_task_cap=20,
                           assign_method="numpy").collect())
    explicit = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in
        sim.semdedup_pairs(emb, cents, threshold=0.2, cell_task_cap=20,
                           pair_backend="numpy",
                           assign_method="numpy").collect())
    assert auto_fat == explicit
    with pytest.raises(ValueError, match="single-probe"):
        sim.semdedup_pairs(emb, cents, n_probe=2,
                           pair_backend="numpy")
    with pytest.raises(ValueError, match="pair_backend"):
        sim.semdedup_pairs(emb, cents, pair_backend="bogus")
    # end-to-end: semdedup survivors identical across backends
    keep_sql = {r["vec_id"] for r in
                sim.semdedup(emb, cents, threshold=0.4,
                             pair_backend="sql").collect()}
    keep_np = {r["vec_id"] for r in
               sim.semdedup(emb, cents, threshold=0.4, cell_task_cap=20,
                            pair_backend="numpy").collect()}
    assert keep_np == keep_sql


def test_nan_cosine_pairs_agree_across_backends(spark, tmp_path):
    """Review finding (r9): Spark predicates treat NaN as LARGER than
    any value, so the sql lane's bare `cos_sim >= threshold` emitted
    NaN-cosine pairs the numpy kernel dropped — backend choice changed
    semdedup survivor sets.  NaN cosines are unmatchable (admit-lane
    contract); both backends must now drop them.  Vectors go through
    PARQUET (createDataFrame's Arrow lane can null-out NaNs; parquet
    preserves them faithfully)."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    nan = float("nan")
    src = str(tmp_path / "v")
    spark.range(1).select(
        F.lit(1).alias("vec_id"),
        F.array(*[F.lit(nan)] * 4).alias("embedding")).unionByName(
        spark.range(1).select(
            F.lit(2).alias("vec_id"),
            F.array(*[F.lit(nan)] * 4).alias("embedding"))
    ).unionByName(spark.range(1).select(
        F.lit(3).alias("vec_id"),
        F.array(F.lit(0.5), F.lit(0.5), F.lit(0.5), F.lit(0.5))
        .alias("embedding"))).write.parquet(src)
    emb = spark.read.parquet(src)
    # vectors really carry NaN (not null) after the parquet round-trip
    assert emb.filter(F.isnan(F.element_at("embedding", 1))) \
        .count() == 2
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    for backend in ("sql", "numpy"):
        pairs = sim.semdedup_pairs(emb, cents, threshold=0.9,
                                   assign_method="numpy",
                                   pair_backend=backend).collect()
        assert pairs == [], backend
        kept = {r["vec_id"] for r in
                sim.semdedup(emb, cents, threshold=0.9,
                             pair_backend=backend).collect()}
        assert kept == {1, 2, 3}, backend


def test_float_id_into_integral_index_refused(spark, tmp_path):
    """Review finding (r9): the id cast guard was one-directional —
    double ids arriving at a long-id IVF-PQ index truncated/wrapped
    silently."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = _emb9(spark)   # vec_id long
    cents = sim.hyperplanes(64, 4, seed="fid")
    cbs = sim.pq_codebooks(64, m=4, k=8)
    path = str(tmp_path / "idx")
    sim.write_ivfpq(emb, path, cents, cbs, residual=True)
    inc = spark.createDataFrame(
        [(9001.5, [1.0] + [0.0] * 63)],
        "vec_id double, embedding array<double>")
    with pytest.raises(ValueError, match="floating-to-integral"):
        sim.embedding_filter_new(spark, path, inc, threshold=0.95,
                                 n_probe=1, probe_margin=None,
                                 admit=True).collect()


def test_cell_task_cap_validated(spark):
    from pydiverse_transform_spark.extras import similarity as sim

    emb = _emb9(spark)
    cents = sim.hyperplanes(64, 4, seed="blk")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="cell_task_cap"):
            sim.semdedup_pairs(emb, cents, cell_task_cap=bad)


def test_nan_guard_on_lsh_pairs_and_decontamination(spark, tmp_path):
    """Same Spark-NaN-passes-predicates hazard, remaining two sites:
    embedding_neardup_pairs (sign-LSH buckets) and
    semantic_contaminated_ids (one NaN benchmark row must not flag its
    whole cell as contaminated)."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    nan = float("nan")
    src = str(tmp_path / "v")
    rows = [(1, [nan] * 4), (2, [nan] * 4), (3, [0.5] * 4),
            (4, [0.5] * 4)]
    df = None
    for vid, vec in rows:
        part = spark.range(1).select(
            F.lit(vid).alias("vec_id"),
            F.array(*[F.lit(float(x)) for x in vec]).alias("embedding"))
        df = part if df is None else df.unionByName(part)
    df.write.parquet(src)
    emb = spark.read.parquet(src)
    pairs = sim.embedding_neardup_pairs(emb, threshold=0.9,
                                        n_planes=2, dim=4).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in pairs) == [(3, 4)]
    # a NaN benchmark row flags nothing; the real near-identical row
    # still flags (fresh read: self-lineage benchmark frames trip
    # Catalyst attribute binding in the self-join)
    bench = spark.read.parquet(src) \
        .filter(F.col("vec_id").isin([1, 3])).select("embedding")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    bad = {r["vec_id"] for r in sim.semantic_contaminated_ids(
        emb.filter(F.col("vec_id").isin([2, 4])), bench, cents,
        threshold=0.9).collect()}
    assert bad == {4}


def test_decontaminate_survives_shared_lineage(spark, tmp_path):
    """Corpus and benchmark derived from the SAME DataFrame/scan used
    to crash at runtime (Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND:
    relation dedup misses attr refs inside the dot/norm lambdas).  The
    benchmark's celled projection is now materialized as a literal
    frame — it is eval-set-sized and broadcasts anyway — severing the
    shared lineage."""
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    src = str(tmp_path / "v")
    rows = [(1, [0.5] * 4), (2, [0.51] * 4), (3, [0.0, 1.0, 0.0, 0.0])]
    df = None
    for vid, vec in rows:
        p = spark.range(1).select(
            F.lit(vid).alias("vec_id"),
            F.array(*[F.lit(float(x)) for x in vec]).alias("embedding"))
        df = p if df is None else df.unionByName(p)
    df.write.parquet(src)
    emb = spark.read.parquet(src)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    # same-object lineage on both sides — the crash shape
    bad = {r["vec_id"] for r in sim.semantic_contaminated_ids(
        emb.filter(F.col("vec_id").isin([2, 3])),
        emb.filter(F.col("vec_id") == 1).select("embedding"),
        cents, threshold=0.99).collect()}
    assert bad == {2}
