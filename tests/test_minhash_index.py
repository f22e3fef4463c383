"""Persisted MinHash-LSH index (extras/dedup.py write_minhash_index /
minhash_index_append / minhash_index_lookup / neardup_filter_new): the
incremental near-dup lifecycle for a growing corpus.

Contracts pinned here:
- append exactness: an appended index answers lookups identically to an
  index rebuilt from the unioned corpus (LSH rows are model-free);
- the sidecar freezes hashing parameters — probes band exactly like the
  indexed rows, including the char-shingle lane;
- est_jaccard is the signature-agreement estimator (multiples of
  1/n_hashes), self-pairs estimate 1.0;
- broadcast lookups never shuffle the index side;
- neardup_filter_new admits survivors exactly once (dedup-then-admit).
"""
from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import dedup

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _lookup_rows(df):
    return sorted((r["probe_id"], r["index_id"], r["est_jaccard"])
                  for r in df.collect())


def test_roundtrip_sidecar_and_self_lookup(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path, k=3, n_hashes=16, bands=4)
    meta = dedup.read_minhash_meta(spark, path)
    assert meta["format"] == "minhashlsh/1"
    assert (meta["k"], meta["n_hashes"], meta["bands"]) == (3, 16, 4)
    # probing with the indexed docs themselves: every doc pairs with
    # itself at estimate exactly 1.0
    hits = dedup.minhash_index_lookup(spark, path, docs, threshold=0.0)
    self_pairs = hits.filter(F.col("probe_id") == F.col("index_id"))
    assert self_pairs.count() == docs.count()
    assert self_pairs.filter(F.col("est_jaccard") != 1.0).count() == 0
    # estimates are multiples of 1/16
    bad = hits.filter(
        (F.col("est_jaccard") * 16) % 1 != 0).count()
    assert bad == 0


def test_append_equals_rebuild(spark, tmp_path):
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 3 != 0)
    inc = docs.filter(F.col("doc_id") % 3 == 0)
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    p_app = str(tmp_path / "appended")
    p_full = str(tmp_path / "rebuilt")
    dedup.write_minhash_index(base, p_app)
    dedup.minhash_index_append(spark, p_app, inc)
    dedup.write_minhash_index(docs, p_full)
    got = _lookup_rows(dedup.minhash_index_lookup(
        spark, p_app, probe, threshold=0.2))
    want = _lookup_rows(dedup.minhash_index_lookup(
        spark, p_full, probe, threshold=0.2))
    assert got == want and len(got) > 0


def test_lookup_matches_batch_estimator(spark, tmp_path):
    """Index lookup at threshold 0 over a self-probe must produce the
    same candidate pairs as the batch LSH (same banding), and the
    estimator must be the signature-agreement fraction recomputed
    independently."""
    docs = _docs(spark).limit(200)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path)
    hits = dedup.minhash_index_lookup(spark, path, docs, threshold=0.0)
    got_pairs = {(a, b) for a, b, _ in _lookup_rows(hits) if a < b}
    batch = dedup.lsh_candidate_pairs(docs, "text", "doc_id",
                                      k=3, n_hashes=16, bands=4)
    want_pairs = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    assert got_pairs == want_pairs
    # independent estimator recompute for every pair
    sh = dedup.shingled(docs, "text", "doc_id", 3)
    sigs = {r["doc_id"]: list(r["sig"]) for r in sh.select(
        "doc_id",
        dedup.minhash_signature_array(
            dedup.shingle_base_hash(F.col("__sh")), 16).alias("sig"),
    ).collect()}
    for a, b, est in _lookup_rows(hits):
        agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        assert est == pytest.approx(round(agree / 16.0, 6))


def test_char_lane_and_param_freeze(spark, tmp_path):
    """char=True indexes band on character shingles; the sidecar makes
    the probe side follow automatically."""
    docs = _docs(spark).limit(100)
    path = str(tmp_path / "cidx")
    dedup.write_minhash_index(docs, path, k=5, char=True,
                              n_hashes=16, bands=8)
    meta = dedup.read_minhash_meta(spark, path)
    assert meta["char"] is True and meta["bands"] == 8
    hits = dedup.minhash_index_lookup(spark, path, docs)
    assert hits.filter(
        (F.col("probe_id") == F.col("index_id"))
        & (F.col("est_jaccard") == 1.0)).count() == 100


def test_errors(spark, tmp_path):
    docs = _docs(spark).limit(5)
    with pytest.raises(ValueError, match="not divisible"):
        dedup.write_minhash_index(docs, str(tmp_path / "x"),
                                  n_hashes=16, bands=5)
    docs.write.parquet(str(tmp_path / "plain"))
    with pytest.raises(FileNotFoundError, match="not a"):
        dedup.read_minhash_meta(spark, str(tmp_path / "plain"))
    with pytest.raises(ValueError, match="probe_strategy"):
        dedup.write_minhash_index(docs, str(tmp_path / "y"))
        dedup.minhash_index_lookup(spark, str(tmp_path / "y"), docs,
                                   probe_strategy="bogus")


def test_broadcast_lookup_never_shuffles_index(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path)
    probe = docs.limit(10)
    plan = dedup.minhash_index_lookup(
        spark, path, probe, probe_strategy="broadcast",
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # shuffle strategy is available for huge probes and agrees
    a = _lookup_rows(dedup.minhash_index_lookup(
        spark, path, probe, probe_strategy="shuffle"))
    b = _lookup_rows(dedup.minhash_index_lookup(
        spark, path, probe, probe_strategy="broadcast"))
    assert a == b


def test_neardup_filter_new_admit_cycle(spark, tmp_path):
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    # increment: half re-ingested texts under new ids (near-dups of the
    # index), half genuinely new (reversed text shingles nothing like
    # the corpus — the sf0.001 corpus is replica groups, so unmodified
    # odd docs would ALL near-dup an indexed even doc)
    dup_inc = (docs.filter(F.col("doc_id") % 4 == 0)
               .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    new_inc = (docs.filter(F.col("doc_id") % 2 == 1)
               .withColumn("text", F.reverse(F.col("text")))
               .withColumn("doc_id", F.col("doc_id") + 5_000_000))
    inc = dup_inc.unionByName(new_inc)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(base, path)
    surv = dedup.neardup_filter_new(spark, path, inc, threshold=0.9,
                                    admit=True)
    surv_ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    # every re-ingested text was dropped; the genuinely-new docs kept
    # (allow near-dup collisions among the odd docs themselves: none
    # of the dup_inc ids may survive)
    assert not any(i >= 10_000_000 for i in surv_ids)
    assert len(surv_ids) > 0
    # admit=True made the survivors part of the index: re-probing the
    # same texts under fresh ids now drops ALL of them
    reprobe = surv.withColumn("doc_id", F.col("doc_id") + 20_000_000)
    again = dedup.neardup_filter_new(spark, path, reprobe,
                                     threshold=0.9)
    assert again.count() == 0


def test_edge_texts_agree_with_batch(spark, tmp_path):
    """Empty/null/short texts: the index estimator and the batch
    true-Jaccard op make the SAME pairing decisions (empty and null
    texts are mutual exact-dups — one degenerate whole-text shingle —
    and distinct short texts pair with nothing), so swapping the batch
    op for the index cannot change what an ingest pipeline drops."""
    docs = spark.createDataFrame(
        [(1, "real document with plenty of words to shingle here"),
         (2, ""), (3, None), (4, "ab"), (5, "xy zz")],
        "doc_id long, text string")
    path = str(tmp_path / "edge")
    dedup.write_minhash_index(docs, path)
    idx_pairs = {(r["probe_id"], r["index_id"])
                 for r in dedup.minhash_index_lookup(
                     spark, path, docs, threshold=0.9)
                 .filter(F.col("probe_id") < F.col("index_id")).collect()}
    batch_pairs = {(r["id_a"], r["id_b"])
                   for r in dedup.minhash_dedup_pairs(
                       docs, threshold=0.9).collect()}
    assert idx_pairs == batch_pairs == {(2, 3)}


# ---------------------------------------------------------------------------
# differential fuzz: minhash_index_lookup vs a DuckDB replay of the
# banding + signature-agreement estimator on hypothesis-generated
# corpora (nulls, empties, unicode whitespace, replica fragments)
# ---------------------------------------------------------------------------

def _duckdb_lookup(rows):
    """(probe_id, index_id, est) triples from DuckDB replaying the index
    banding + estimator over a self-probe of ``rows``."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as se

    sig = ", ".join(se._minhash_sql("bh", 16))
    bands = ", ".join(
        f"{{'band': {b}, "
        f"'h': md5(array_to_string(sig[{b * 4 + 1}:{b * 4 + 4}], '|'))}}"
        for b in range(4)
    )
    est = ("round(len(list_filter(range(1, 17), "
           "i -> p.sig[i] = c.sig[i])) / 16.0, 6)")
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame(rows, columns=["doc_id", "text"])
                 .astype({"doc_id": "int64"}))
    out = con.execute(f"""
WITH bh_t AS (
  SELECT doc_id,
         list_transform({se._shingle_sql('text')},
                        s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS bh
  FROM corpus
), sig_t AS (SELECT doc_id, [{sig}] AS sig FROM bh_t),
b_t AS (
  SELECT doc_id, sig, bb.band AS band, bb.h AS h
  FROM sig_t, UNNEST([{bands}]) AS t(bb)
)
SELECT DISTINCT p.doc_id, c.doc_id, {est}
FROM b_t p JOIN b_t c ON p.band = c.band AND p.h = c.h
""").fetchall()
    con.close()
    return {(a, b, e) for a, b, e in out}


_VOCAB = ["alpha", "beta", "gamma", "delta", "x", "unicöde",
          "nb\xa0sp", "tab\there"]


def _corpus_strategy():
    from hypothesis import strategies as st

    text = st.one_of(
        st.none(),
        st.just(""),
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12)
        .map(" ".join),
    )
    return st.lists(text, min_size=1, max_size=14).map(
        lambda ts: [(i, t) for i, t in enumerate(ts)])


def test_fuzz_lookup_matches_duckdb(spark, tmp_path):
    from hypothesis import HealthCheck, given, settings

    counter = [0]

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(_corpus_strategy())
    def run(rows):
        counter[0] += 1
        path = str(tmp_path / f"fz{counter[0]}")
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        dedup.write_minhash_index(docs, path)
        got = {(r["probe_id"], r["index_id"], r["est_jaccard"])
               for r in dedup.minhash_index_lookup(
                   spark, path, docs, threshold=0.0).collect()}
        want = _duckdb_lookup(rows)
        assert got == want

    run()


def test_append_casts_id_to_index_type(spark, tmp_path):
    """Appending an increment whose id column is a lookalike type (int
    vs the index's long) must not write mixed-schema files — later
    reads would crash with PARQUET_COLUMN_DATA_TYPE_MISMATCH."""
    docs = _docs(spark).limit(20)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path)  # doc_id: long
    inc = spark.createDataFrame(
        [(7001, "a freshly arriving document with its own words")],
        "doc_id int, text string")        # doc_id: INT on purpose
    dedup.minhash_index_append(spark, path, inc)
    # the whole index (old + appended files) stays readable and typed
    idx = spark.read.parquet(path)
    assert dict(idx.dtypes)["doc_id"] == "bigint"
    hits = dedup.minhash_index_lookup(spark, path, docs)
    assert hits.count() > 0


def test_append_refuses_integral_narrowing(spark, tmp_path):
    """Long ids arriving at an int-id index must raise, not wrap: a
    bare ANSI-off cast would silently admit rows under wrong ids."""
    docs = spark.createDataFrame(
        [(1, "the first indexed document with some words"),
         (2, "another indexed document with different words")],
        "doc_id int, text string")   # int ids on purpose
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path)
    assert dedup.read_minhash_meta(spark, path)["id_type"] == "int"
    inc = spark.createDataFrame(
        [(5_000_000_000, "a long-id arrival beyond int range")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="narrowing"):
        dedup.minhash_index_append(spark, path, inc)


def test_append_refuses_float_id_precision_loss(spark, tmp_path):
    """r9 (ADVICE): long ids arriving at a DOUBLE-id index must raise —
    above 2^53 the integral-to-floating cast rounds distinct ids onto
    the same value, colliding rows on append."""
    docs = spark.createDataFrame(
        [(1.0, "the first indexed document with some words"),
         (2.0, "another indexed document with different words")],
        "doc_id double, text string")   # float ids on purpose
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path)
    assert dedup.read_minhash_meta(spark, path)["id_type"] == "double"
    inc = spark.createDataFrame(
        [(2**53 + 1, "a long-id arrival beyond double exactness")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="collide"):
        dedup.minhash_index_append(spark, path, inc)


# ---------------------------------------------------------------------------
# r9: minhash_index_maintain — compaction + replay-duplicate removal
# with the journaled atomic swap (the minhash twin of ivfpq_maintain's
# dedup_ids lane)
# ---------------------------------------------------------------------------

def _maintain_fixture(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "an entirely different document about spark engines"),
         (3, "a third unrelated text body with distinct words")],
        "doc_id long, text string")
    path = str(tmp_path / "midx")
    dedup.write_minhash_index(docs, path)
    return docs, path


def test_minhash_maintain_dedups_replayed_appends(spark, tmp_path):
    docs, path = _maintain_fixture(spark, tmp_path)
    n0 = spark.read.parquet(path).count()
    probe = spark.createDataFrame(
        [(9001, "fresh arriving words never indexed before today")],
        "doc_id long, text string")
    lookup_before = sorted(
        (r["probe_id"], r["index_id"]) for r in
        dedup.minhash_index_lookup(spark, path, docs,
                                   threshold=0.9).collect())
    # simulate an at-least-once replay: the same docs appended twice
    dedup.minhash_index_append(spark, path, docs.filter("doc_id <= 2"))
    dedup.minhash_index_append(spark, path, docs.filter("doc_id <= 2"))
    assert spark.read.parquet(path).count() > n0
    stats = dedup.minhash_index_maintain(spark, path)
    assert stats["recovered"] is None
    idx = spark.read.parquet(path)
    assert idx.count() == n0
    assert idx.groupBy("doc_id", "band").count() \
        .filter(F.col("count") > 1).count() == 0
    # sidecar survives the swap and lookups are unchanged
    assert dedup.read_minhash_meta(spark, path)["format"] \
        == "minhashlsh/1"
    lookup_after = sorted(
        (r["probe_id"], r["index_id"]) for r in
        dedup.minhash_index_lookup(spark, path, docs,
                                   threshold=0.9).collect())
    assert lookup_after == lookup_before
    assert dedup.minhash_index_lookup(spark, path, probe,
                                      threshold=0.5).count() == 0


def test_minhash_maintain_journal_recovery(spark, tmp_path):
    """The four-state recovery decision table, exercised on the two
    states a crash most plausibly leaves: stale .__new with the live
    index intact (phase-2 crash -> roll back), and a journal with only
    .__old surviving (crash between the two renames -> roll back to
    .__old)."""
    import shutil as _sh

    from pydiverse_transform_spark.extras.util import fs_write_json

    docs, path = _maintain_fixture(spark, tmp_path)
    n0 = spark.read.parquet(path).count()
    # state: index ∧ .__new (+ journal) -> delete stale .__new
    _sh.copytree(path, path + ".__new")
    fs_write_json(spark, path + ".__swap", {"index": path})
    stats = dedup.minhash_index_maintain(spark, path)
    assert stats["recovered"] == "rolled_back_stale_new"
    assert spark.read.parquet(path).count() == n0
    # state: ¬index ∧ .__old (+ journal) -> .__old becomes index again
    _sh.move(path, path + ".__old")
    fs_write_json(spark, path + ".__swap", {"index": path})
    stats = dedup.minhash_index_maintain(spark, path)
    assert stats["recovered"] == "rolled_back_old"
    assert spark.read.parquet(path).count() == n0
    # wrong-index journal refuses loudly
    fs_write_json(spark, path + ".__swap", {"index": "/elsewhere"})
    with pytest.raises(IOError, match="refusing"):
        dedup.minhash_index_maintain(spark, path)


def test_auto_governor_routes_both_ways(spark, tmp_path):
    """governors='auto' (r13): under the candidate budget the result
    is BIT-IDENTICAL to governors='off' and no governor warning fires;
    over the budget (forced via auto_budget=0) it equals the explicit
    min_bands=2/top_k=100 lookup and warns; explicitly set governors
    are honored as given with no auto interference."""
    import warnings

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path, k=3, n_hashes=16, bands=4)
    probe = docs.filter(F.col("doc_id") % 5 == 0)

    off = _lookup_rows(dedup.minhash_index_lookup(
        spark, path, probe, threshold=0.2, governors="off"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto = _lookup_rows(dedup.minhash_index_lookup(
            spark, path, probe, threshold=0.2))
    assert auto == off
    assert not [x for x in w if "candidate-volume" in str(x.message)]

    with pytest.warns(UserWarning, match="candidate-volume governors"):
        engaged = _lookup_rows(dedup.minhash_index_lookup(
            spark, path, probe, threshold=0.2, auto_budget=0))
    explicit = _lookup_rows(dedup.minhash_index_lookup(
        spark, path, probe, threshold=0.2, min_bands=2, top_k=100,
        governors="off"))
    assert engaged == explicit
    assert engaged != off  # the forced route actually pruned

    # explicit governors win: auto neither re-routes nor warns, even
    # with a zero budget
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        exp_auto = _lookup_rows(dedup.minhash_index_lookup(
            spark, path, probe, threshold=0.2, min_bands=2, top_k=3,
            auto_budget=0))
    assert not [x for x in w if "candidate-volume" in str(x.message)]
    assert exp_auto == _lookup_rows(dedup.minhash_index_lookup(
        spark, path, probe, threshold=0.2, min_bands=2, top_k=3,
        governors="off"))

    with pytest.raises(ValueError, match="governors"):
        dedup.minhash_index_lookup(spark, path, probe,
                                   governors="sometimes")


def test_projected_candidate_rows_exact(spark, tmp_path):
    """The auto-governor's projection is the EXACT candidate-row count
    of the bucket join (sum over colliding buckets of n_idx * n_probe),
    not an estimate."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path, k=3, n_hashes=16, bands=4)
    meta = dedup.read_minhash_meta(spark, path)
    probe = docs.filter(F.col("doc_id") % 5 == 0)
    pb = dedup._probe_buckets(meta, probe)
    idx = spark.read.parquet(path)
    assert (dedup._projected_candidate_rows(idx, pb)
            == idx.join(pb, on=["band", "h"], how="inner").count())


def test_index_footer_rows_and_bound_fast_path(spark, tmp_path):
    """The r13 projection fast path: footer row count is exact, the
    probe-side bound dominates the exact projection, and a bound over
    the budget falls back to the exact index-scan sum — so routing
    decisions are identical to the always-exact path."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    dedup.write_minhash_index(docs, path, k=3, n_hashes=16, bands=4)
    assert dedup._index_footer_rows(path) \
        == spark.read.parquet(path).count()
    assert dedup._index_footer_rows(str(tmp_path / "nope")) is None

    meta = dedup.read_minhash_meta(spark, path)
    probe = docs.filter(F.col("doc_id") % 5 == 0)
    pb = dedup._probe_buckets(meta, probe)
    idx = spark.read.parquet(path)
    exact = dedup._projected_candidate_rows(idx, pb)
    fast = dedup._projected_candidate_rows(idx, pb, index_path=path,
                                           budget=1 << 40)
    assert fast >= exact  # the bound dominates
    # bound > budget -> exact fallback, identical value
    assert dedup._projected_candidate_rows(
        idx, pb, index_path=path, budget=0) == exact
    # appends keep the footer count exact
    dedup.minhash_index_append(spark, path, probe)
    assert dedup._index_footer_rows(path) \
        == spark.read.parquet(path).count()
