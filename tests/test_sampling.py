"""Deterministic sampling/splitting properties (extras/sampling.py):
the selection must be a pure function of the row key — independent of
partitioning, repeatable across runs, and stable under data changes.
"""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
    topk_per_group,
    weighted_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_hash_sample_partition_invariant(docs):
    ids1 = {r.doc_id for r in
            hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    ids2 = {r.doc_id for r in
            hash_sample(docs.repartition(17, "lang"), 0.3, "doc_id")
            .select("doc_id").collect()}
    assert ids1 == ids2
    n = docs.count()
    assert 0.2 * n < len(ids1) < 0.4 * n


def test_hash_sample_salt_gives_independent_draw(docs):
    a = {r.doc_id for r in
         hash_sample(docs, 0.3, "doc_id", salt="a").collect()}
    b = {r.doc_id for r in
         hash_sample(docs, 0.3, "doc_id", salt="b").collect()}
    assert a != b
    # overlap ≈ 9% of total for independent 30% draws, not 30%
    assert len(a & b) < 0.2 * docs.count()


def test_hash_sample_fraction_bounds(docs):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, 1.5, "doc_id")


def test_hash_split_partitions_every_row_once(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                     "doc_id")
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"]


def test_hash_split_stable_under_subset(docs):
    """A row's split must not change when other rows disappear —
    train/test hygiene under dataset growth."""
    full = {r.doc_id: r.split for r in
            hash_split(docs, {"train": 0.5, "test": 0.5}, "doc_id")
            .select("doc_id", "split").collect()}
    sub = {r.doc_id: r.split for r in
           hash_split(docs.filter(F.col("doc_id") % 3 == 0),
                      {"train": 0.5, "test": 0.5}, "doc_id")
           .select("doc_id", "split").collect()}
    for k, v in sub.items():
        assert full[k] == v


def test_hash_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"a": 0.5, "b": 0.6}, "doc_id")


def test_stratified_sample_rates(docs):
    out = stratified_sample(docs, {"en": 0.0, "de": 1.0}, "lang",
                            "doc_id", default_fraction=0.5)
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r.lang: r.n for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in got
    assert got["de"] == base["de"]
    others = [lang for lang in base if lang not in ("en", "de")]
    for lang in others:
        assert 0 < got.get(lang, 0) <= base[lang]


def test_weighted_mix_counts_and_sources(docs):
    out = weighted_mix([(docs, 1.0), (docs, 0.25)], "doc_id",
                       source_col="src")
    got = {r.src: r.n for r in
           out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert got[0] == n
    assert 0.1 * n < got[1] < 0.4 * n


def test_topk_per_group_exact(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0),
         ("b", 4, 5.0), ("b", 5, 5.0), ("b", 6, 5.0)],
        ["g", "id", "score"],
    )
    out = topk_per_group(df, ["g"], "score", 2, tiebreak_col="id")
    rows = {(r.g, r.id) for r in out.collect()}
    # a: top-2 scores; b: all tied -> lowest ids win deterministically
    assert rows == {("a", 2), ("a", 3), ("b", 4), ("b", 5)}


def test_sampling_is_pure_filter_no_shuffle(docs):
    """hash_sample must not add an Exchange: the plan is scan+filter."""
    plan = hash_sample(docs, 0.5, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_layout(spark):
    from pydiverse_transform_spark.extras.sampling import pack_sequences

    df = spark.createDataFrame(
        [(0, "a", 300), (1, "a", 300), (2, "a", 300), (3, "b", 600)],
        ["doc_id", "src", "n_tok"],
    )
    out = {r.doc_id: (r.bin_id, r.bin_pos) for r in pack_sequences(
        df, "n_tok", budget=512, order_by="doc_id", partition_by="src"
    ).collect()}
    # src a: cum-before 0, 300, 600 -> bins 0,0,1; pos 0,300,88
    assert out[0] == (0, 0)
    assert out[1] == (0, 300)
    assert out[2] == (1, 88)
    # src b packs independently
    assert out[3] == (0, 0)


def test_pack_sequences_single_shuffle(spark, sf_dir):
    from pydiverse_transform_spark.extras.sampling import pack_sequences

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = pack_sequences(df, "n_chars", budget=512, order_by="doc_id",
                          partition_by="source") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_deterministic_shuffle_partition_invariant(docs):
    from pydiverse_transform_spark.extras.sampling import (
        deterministic_shuffle,
    )

    a = {(r.doc_id, r.shard, r.shard_pos) for r in
         deterministic_shuffle(docs, "doc_id", n_shards=16)
         .select("doc_id", "shard", "shard_pos").collect()}
    b = {(r.doc_id, r.shard, r.shard_pos) for r in
         deterministic_shuffle(docs.repartition(13, "lang"), "doc_id",
                               n_shards=16)
         .select("doc_id", "shard", "shard_pos").collect()}
    assert a == b
    shards = {s for _, s, _ in a}
    assert shards <= set(range(16)) and len(shards) > 1
    # shard_pos is a dense 1..n_shard ranking inside each shard
    import collections

    per_shard = collections.defaultdict(list)
    for _, s, p in a:
        per_shard[s].append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s


def test_deterministic_shuffle_null_key_and_tiebreak(spark):
    from pydiverse_transform_spark.extras.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame(
        [("k1", 1), ("k1", 2), ("k1", 3), (None, 4), ("k2", 5)],
        "k string, id int",
    )
    out = deterministic_shuffle(df, "k", n_shards=4, tiebreak_col="id")
    rows = out.select("k", "id", "shard", "shard_pos").collect()
    # NULL keys still get a shard address (md5(concat(NULL,..)) is NULL
    # without the coalesce guard, which would drop them)
    assert all(r.shard is not None and r.shard_pos is not None
               for r in rows)
    # duplicate keys: tiebreak makes positions a pure function of the row
    again = deterministic_shuffle(
        df.repartition(7), "k", n_shards=4, tiebreak_col="id",
    ).select("k", "id", "shard", "shard_pos").collect()
    canon = lambda rs: sorted(  # noqa: E731
        ((r.k or "", r.id, r.shard, r.shard_pos) for r in rs)
    )
    assert canon(rows) == canon(again)
    dup_pos = sorted((r.id, r.shard_pos) for r in rows if r.k == "k1")
    assert [p for _, p in dup_pos] == sorted(p for _, p in dup_pos)


def test_deterministic_shuffle_duplicate_keys_rejected(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    from pydiverse_transform_spark.extras.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame(
        [("k1", 1), ("k1", 2), ("k2", 3)], "k string, id int",
    )
    # duplicate key without tiebreak_col => engine-dependent shard_pos;
    # the contract is enforced at runtime (assert_true in the plan)
    with pytest.raises(SparkRuntimeException, match="duplicate value in key_col"):
        deterministic_shuffle(df, "k", n_shards=4).collect()
    # unique keys: no tiebreak needed, runs clean
    uniq = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, id int",
    )
    out = deterministic_shuffle(uniq, "k", n_shards=4).collect()
    assert len(out) == 3 and all(r.shard_pos >= 1 for r in out)


# --------------------------------------------------------------------------
# filter_by_quantile: percentile quality gate
# --------------------------------------------------------------------------

def test_quantile_exact_known_ranks(spark):
    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id int, score double"
    )
    # discrete 0.5-quantile of 1..10 is 5 (cume_dist of 5 is 0.5);
    # the cut keeps score >= 5
    kept = sorted(
        r.id for r in filter_by_quantile(df, "score", 0.5).collect()
    )
    assert kept == [5, 6, 7, 8, 9, 10]
    # boundaries
    assert filter_by_quantile(df, "score", 0.0).count() == 10
    top = filter_by_quantile(df, "score", 1.0).collect()
    assert [r.id for r in top] == [10]


def test_quantile_one_semantics_both_paths(spark):
    """The advice-r5 divergence case: threshold tie-groups, singleton
    groups and group minima must behave IDENTICALLY on the exact and
    approximate paths — the cut is a value threshold, ties kept."""
    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    rows = (
        # group a: heavy tie at the bottom — [1,1,1,1,10], q=0.5:
        # discrete quantile is 1, ALL five rows keep (tie-group unit)
        [(i, "a", 1.0) for i in range(4)] + [(4, "a", 10.0)]
        # group b: singleton — must survive any q
        + [(5, "b", 7.0)]
        # group c: distinct scores 1..4, q=0.5 -> threshold 2, keep 2..4
        + [(6 + i, "c", float(i + 1)) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "id int, g string, score double")
    expect = {0, 1, 2, 3, 4, 5, 7, 8, 9}
    for exact in (True, False):
        kept = {r.id for r in filter_by_quantile(
            df, "score", 0.5, partition_by=["g"], exact=exact).collect()}
        assert kept == expect, (exact, sorted(kept))
    # diagnostic column is __thr on BOTH paths now
    for exact in (True, False):
        cols = filter_by_quantile(
            df, "score", 0.5, partition_by=["g"], exact=exact,
            keep_quantile_col=True).columns
        assert "__thr" in cols, (exact, cols)


def test_quantile_exact_matches_duckdb_quantile_disc(spark):
    """exact=True is DuckDB's quantile_disc by construction."""
    import duckdb
    import pyarrow as pa

    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    import random
    rng = random.Random(616)
    rows = [(i, rng.choice(["x", "y"]), float(rng.randint(0, 6)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id int, g string, score double")
    con = duckdb.connect()
    con.register("tbl", pa.table({
        "id": [r[0] for r in rows], "g": [r[1] for r in rows],
        "score": [r[2] for r in rows]}))
    for q in (0.0, 0.3, 0.5, 0.9, 1.0):
        kept = {r.id for r in filter_by_quantile(
            df, "score", q, partition_by=["g"], exact=True).collect()}
        want = {r[0] for r in con.execute(f"""
            SELECT id FROM tbl t JOIN (
              SELECT g, quantile_disc(score, {q}) AS thr
              FROM tbl GROUP BY g) u USING (g)
            WHERE score >= thr""").fetchall()}
        assert kept == want, (q, sorted(kept ^ want))


def test_global_window_guards_warn_on_large_unpartitioned(spark, sf_dir):
    import warnings as w

    from pydiverse_transform_spark.extras import sampling as sp

    # parquet-backed (stats known); a driver-created frame for the
    # silent unknown-stats path
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars")
    local = spark.createDataFrame(
        [(i, float(i), 5) for i in range(20)],
        "id int, score double, toks int")
    # small / unknown inputs: silent
    with w.catch_warnings():
        w.simplefilter("error", ResourceWarning)
        sp.filter_by_quantile(docs, "n_chars", 0.5)
        sp.filter_by_quantile(local, "score", 0.5)
        sp.take_token_budget(local, "toks", 10, order_by="id")
        sp.pack_sequences(local, "toks", budget=10, order_by="id")
    # threshold forced to 0: every unpartitioned global window over a
    # stats-carrying input warns; partitioned calls stay silent
    orig = sp.UNPARTITIONED_WINDOW_WARN_BYTES
    sp.UNPARTITIONED_WINDOW_WARN_BYTES = 0
    try:
        for call in (
            lambda: sp.filter_by_quantile(docs, "n_chars", 0.5),
            lambda: sp.take_token_budget(docs, "n_chars", 10,
                                         order_by="doc_id"),
            lambda: sp.pack_sequences(docs, "n_chars", budget=10,
                                      order_by="doc_id"),
        ):
            with w.catch_warnings(record=True) as rec:
                w.simplefilter("always")
                call()
            assert any(issubclass(x.category, ResourceWarning)
                       and "single-reducer" in str(x.message)
                       for x in rec), [str(x.message) for x in rec]
        with w.catch_warnings():
            w.simplefilter("error", ResourceWarning)
            sp.filter_by_quantile(docs, "n_chars", 0.5,
                                  partition_by=["doc_id"])
            sp.take_token_budget(docs, "n_chars", 10, order_by="doc_id",
                                 partition_by=["doc_id"])
            sp.pack_sequences(docs, "n_chars", budget=10,
                              order_by="doc_id", partition_by="doc_id")
    finally:
        sp.UNPARTITIONED_WINDOW_WARN_BYTES = orig


def test_quantile_null_scores_dropped_both_paths(spark):
    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (4, None)], "id int, score double"
    )
    for exact in (True, False):
        ids = {r.id for r in
               filter_by_quantile(df, "score", 0.0, exact=exact).collect()}
        assert ids == {1, 3}, exact


def test_quantile_approx_matches_exact_on_corpus(spark, sf_dir):
    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    exact = {r.doc_id for r in filter_by_quantile(
        docs, "n_chars", 0.7, ["lang"], exact=True).collect()}
    approx = {r.doc_id for r in filter_by_quantile(
        docs, "n_chars", 0.7, ["lang"], exact=False).collect()}
    n = docs.count()
    # sketch accuracy 10000 >> group sizes here: at most the boundary
    # tie-group can differ
    assert len(exact ^ approx) <= max(2, n // 100), (
        len(exact), len(approx), len(exact ^ approx))


def test_quantile_approx_path_never_sorts_corpus(spark, sf_dir):
    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = filter_by_quantile(docs, "n_chars", 0.9, ["lang"], exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan, plan[:2000]
    # threshold side reaches the probe as a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_quantile_rejects_bad_fraction(spark):
    import pytest

    from pydiverse_transform_spark.extras.sampling import filter_by_quantile

    df = spark.createDataFrame([(1, 1.0)], "id int, score double")
    with pytest.raises(ValueError, match="min_quantile"):
        filter_by_quantile(df, "score", 1.5)


# --------------------------------------------------------------------------
# take_token_budget: fill a per-group token budget
# --------------------------------------------------------------------------

def test_token_budget_fills_and_overflows_once(spark):
    from pydiverse_transform_spark.extras.sampling import take_token_budget

    df = spark.createDataFrame(
        [(i, 100) for i in range(1, 11)], "id int, toks int"
    )
    kept = sorted(r.id for r in
                  take_token_budget(df, "toks", 250, "id").collect())
    # cum-before: 0, 100, 200, 300... -> keep ids 1..3 (third crosses 250)
    assert kept == [1, 2, 3]
    # exact multiple: budget 200 keeps exactly 2
    kept = sorted(r.id for r in
                  take_token_budget(df, "toks", 200, "id").collect())
    assert kept == [1, 2]


def test_token_budget_per_group_and_nulls(spark):
    from pydiverse_transform_spark.extras.sampling import take_token_budget

    df = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 60), ("a", 3, 60),
         ("b", 1, 10), ("b", 2, None), ("b", 3, 10)],
        "g string, id int, toks int",
    )
    kept = sorted((r.g, r.id) for r in take_token_budget(
        df, "toks", 100, "id", partition_by=["g"]).collect())
    # group a: cum-before 0,60,120 -> keep ids 1,2; group b: NULL dropped,
    # both real rows fit
    assert kept == [("a", 1), ("a", 2), ("b", 1), ("b", 3)]


def test_token_budget_order_direction(spark):
    from pydiverse_transform_spark.extras.sampling import take_token_budget

    df = spark.createDataFrame(
        [(i, 100) for i in range(1, 6)], "id int, toks int"
    )
    kept = sorted(r.id for r in take_token_budget(
        df, "toks", 150, "id", descending=True).collect())
    assert kept == [4, 5]
