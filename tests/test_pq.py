"""Product quantization (extras/similarity.py pq_*): training
determinism, code validity, ADC vs re-rank behavior, plan shape."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras import similarity as sim

QVEC = [((i * 37) % 101 - 50) / 50.0 for i in range(64)]


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _exact_ids(emb, k=10):
    d = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.array(*[F.lit(float(v)) for v in QVEC]),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0), lambda a, v: a + v,
    )
    return [r["vec_id"] for r in emb.select("vec_id", d.alias("d"))
            .orderBy("d", "vec_id").limit(k).collect()]


def test_pq_fit_deterministic_and_shaped(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = sim.pq_fit(emb, m=4, k=4, n_iter=2, dim=64)
    b = sim.pq_fit(emb, m=4, k=4, n_iter=2, dim=64)
    assert a == b
    assert len(a) == 4 and all(len(book) == 4 for book in a)
    assert all(len(cen) == 16 for book in a for cen in book)


def test_pq_encode_codes_in_range(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cbs = sim.pq_codebooks(64, m=8, k=16)
    out = sim.pq_encode(emb, cbs)
    stats = out.select(
        F.array_min("pq_code").alias("lo"),
        F.array_max("pq_code").alias("hi"),
        F.array_size("pq_code").alias("m"),
    ).agg(F.min("lo"), F.max("hi"), F.min("m"), F.max("m")).collect()[0]
    assert stats[0] >= 0 and stats[1] <= 15 and stats[2] == stats[3] == 8


def test_pq_trained_quantization_error_not_worse(spark, sf_dir):
    """Lloyd-trained codebooks must reconstruct the corpus at least as
    well as the fixed md5 ones (that is the point of training)."""
    emb = _emb(spark, sf_dir)
    fixed = sim.pq_codebooks(64, m=4, k=8)
    trained = sim.pq_fit(emb, m=4, k=8, n_iter=3, dim=64)

    def recon_err(cbs):
        enc = sim.pq_encode(emb, cbs)
        err = None
        dsub = len(cbs[0][0])
        for j in range(len(cbs)):
            cens = F.array(*[
                F.array(*[F.lit(float(v)) for v in cen]) for cen in cbs[j]
            ])
            sl = F.slice(F.col("embedding"), j * dsub + 1, dsub)
            cen = F.element_at(
                cens, F.element_at(F.col("pq_code"), j + 1) + 1)
            e = F.aggregate(
                F.zip_with(sl, cen,
                           lambda x, y: (x.cast("double") - y)
                           * (x.cast("double") - y)),
                F.lit(0.0), lambda a, v: a + v)
            err = e if err is None else err + e
        return enc.agg(F.sum(err)).collect()[0][0]

    assert recon_err(trained) <= recon_err(fixed)


def test_pq_rerank_recall_not_worse_than_adc(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cbs = sim.pq_codebooks(64, m=8, k=16)
    exact = set(_exact_ids(emb))
    adc = {r["vec_id"]
           for r in sim.pq_topk(emb, QVEC, k=10, codebooks=cbs).collect()}
    rer = {r["vec_id"]
           for r in sim.pq_topk(emb, QVEC, k=10, codebooks=cbs,
                                pool=100).collect()}
    assert len(exact & rer) >= len(exact & adc)
    # a pool spanning the whole corpus degrades to the exact answer
    n = emb.count()
    full = [r["vec_id"]
            for r in sim.pq_topk(emb, QVEC, k=10, codebooks=cbs,
                                 pool=n).collect()]
    assert full == _exact_ids(emb)


def test_pq_topk_plan_no_shuffle(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cbs = sim.pq_codebooks(64, m=8, k=16)
    for q in (sim.pq_topk(emb, QVEC, k=5, codebooks=cbs),
              sim.pq_topk(emb, QVEC, k=5, codebooks=cbs, pool=50)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "TakeOrdered" in plan, plan


def test_pq_validation():
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_codebooks(64, m=7)


def test_pq_pool_smaller_than_k(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cbs = sim.pq_codebooks(64, m=8, k=16)
    with pytest.raises(ValueError, match="pool"):
        sim.pq_topk(emb, QVEC, k=10, codebooks=cbs, pool=5)


def test_pq_coded_table_scan_prunes_vectors(spark, sf_dir, tmp_path):
    """The materialized-codes path must read ONLY (vec_id, pq_code)
    from parquet — column pruning dropping the float vectors is the
    32x scan saving that justifies PQ at scale — and must return the
    same ids as on-the-fly ADC."""
    emb = _emb(spark, sf_dir)
    cbs = sim.pq_codebooks(64, m=8, k=16)
    path = str(tmp_path / "coded")
    sim.pq_encode(emb, cbs).write.parquet(path)

    coded = spark.read.parquet(path)
    out = sim.pq_topk_coded(coded, QVEC, cbs, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"vec_id", "pq_code"}, read_cols
    assert "Exchange hashpartitioning" not in plan

    onthefly = sim.pq_topk(emb, QVEC, k=10, codebooks=cbs)
    assert ([r["vec_id"] for r in out.collect()]
            == [r["vec_id"] for r in onthefly.collect()])


def test_ivfpq_index_pruning_and_exactness(spark, sf_dir, tmp_path):
    """IVF-PQ layout: cell partitions must prune at the scan (a
    partition-column predicate, not a post-scan filter), the ADC scan
    must read only (vec_id, pq_code), and probing every cell with a
    corpus-wide pool must reproduce the exact top-k."""
    emb = _emb(spark, sf_dir)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    sim.write_ivfpq(emb, path, cents, cbs)

    out = sim.ivfpq_topk(spark, path, QVEC, cents, cbs, k=10, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan, plan
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("embedding" not in s for s in schemas), schemas

    n = emb.count()
    full = [r["vec_id"] for r in sim.ivfpq_topk(
        spark, path, QVEC, cents, cbs, k=10, nprobe=8, pool=n).collect()]
    assert full == _exact_ids(emb)


def test_ivfpq_residual_vs_raw_consistent(spark, sf_dir, tmp_path):
    """residual=True/False must agree when the quantization is exact
    enough to not matter — checked via the corpus-wide re-rank (the
    pool cut differs, the exact re-rank over everything does not)."""
    emb = _emb(spark, sf_dir)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    n = emb.count()
    ids = {}
    for residual in (True, False):
        path = str(tmp_path / f"idx_{residual}")
        sim.write_ivfpq(emb, path, cents, cbs, residual=residual)
        ids[residual] = [r["vec_id"] for r in sim.ivfpq_topk(
            spark, path, QVEC, cents, cbs, k=10, nprobe=8, pool=n,
            residual=residual).collect()]
    assert ids[True] == ids[False] == _exact_ids(emb)


def test_ivfpq_store_vectors_false_is_codes_only(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    path = str(tmp_path / "codes_only")
    sim.write_ivfpq(emb, path, cents, cbs, store_vectors=False)
    cols = set(spark.read.parquet(path).columns)
    assert "embedding" not in cols and {"vec_id", "pq_code",
                                        "cell"} <= cols


# --------------------------------------------------------------------------
# r6: OPQ-lite variance-balancing permutation
# --------------------------------------------------------------------------

def test_opq_permutation_is_valid_and_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    perm = sim.opq_permutation(emb, m=8, dim=64)
    assert sorted(perm) == list(range(64))
    assert perm == sim.opq_permutation(emb, m=8, dim=64)


def test_opq_balances_subspace_variance(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    """The greedy assignment must spread variance at least as evenly as
    the identity layout: max-subspace-variance(opq) <= max(identity)."""
    rows = (
        emb.select(F.posexplode(F.col("embedding")).alias("pos", "v"))
        .groupBy("pos").agg(F.var_samp("v").alias("var")).collect()
    )
    var = {int(r["pos"]): float(r["var"] or 0.0) for r in rows}
    perm = sim.opq_permutation(emb, m=8, dim=64)
    dsub = 8

    def group_sums(layout):
        return [sum(var[d] for d in layout[j * dsub:(j + 1) * dsub])
                for j in range(8)]

    opq_sums = group_sums(perm)
    id_sums = group_sums(list(range(64)))
    assert max(opq_sums) <= max(id_sums) + 1e-9, (opq_sums, id_sums)
    # and the spread (max-min) does not get worse
    assert (max(opq_sums) - min(opq_sums)
            <= max(id_sums) - min(id_sums) + 1e-9)


def test_permute_vec_l2_invariant(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    """Squared L2 between two permuted vectors equals the unpermuted
    distance — the property that keeps ground truth unchanged."""
    perm = sim.opq_permutation(emb, m=8, dim=64)
    two = emb.orderBy("vec_id").limit(2).collect()
    a = [float(v) for v in two[0]["embedding"]]
    b = [float(v) for v in two[1]["embedding"]]
    direct = sum((x - y) ** 2 for x, y in zip(a, b))
    pa = [a[i] for i in perm]
    pb = [b[i] for i in perm]
    permuted = sum((x - y) ** 2 for x, y in zip(pa, pb))
    assert abs(direct - permuted) < 1e-9
    # the Column-side permute agrees with the Python-side one
    row = (
        emb.orderBy("vec_id").limit(1)
        .select(sim.permute_vec(F.col("embedding"), perm).alias("p"))
        .collect()[0]
    )
    assert [float(v) for v in row["p"]] == pa


# --------------------------------------------------------------------------
# r6: self-describing IVF-PQ index (metadata sidecar)
# --------------------------------------------------------------------------

def test_ivfpq_meta_roundtrip_and_auto_query(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    path = str(tmp_path / "idx")
    sim.write_ivfpq(emb, path, cents, cbs, residual=True)
    meta = sim.read_ivfpq_meta(spark, path)
    assert (meta["n_cells"], meta["m"], meta["k_codes"]) == (8, 8, 16)
    assert meta["residual"] is True and meta["store_vectors"] is True
    explicit = sim.ivfpq_topk(spark, path, QVEC, cents, cbs, k=5,
                              nprobe=2, residual=True, pool=50).collect()
    auto = sim.ivfpq_topk_auto(spark, path, QVEC, k=5, nprobe=2,
                               pool=50).collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in explicit]
    # the sidecar is scan-invisible
    assert spark.read.parquet(path).count() == emb.count()


def test_ivfpq_meta_missing_raises(spark, sf_dir, tmp_path):
    import pytest as _pytest

    emb = _emb(spark, sf_dir)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    path = str(tmp_path / "bare")
    sim.write_ivfpq(emb, path, cents, cbs, write_meta=False)
    with _pytest.raises(FileNotFoundError, match="_ivfpq_meta"):
        sim.ivfpq_topk_auto(spark, path, QVEC, k=5)


def test_ivfpq_pool_guard_on_vectorless_index(spark, sf_dir, tmp_path):
    import pytest as _pytest

    emb = _emb(spark, sf_dir)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    path = str(tmp_path / "novec")
    sim.write_ivfpq(emb, path, cents, cbs, store_vectors=False)
    with _pytest.raises(ValueError, match="store_vectors=False"):
        sim.ivfpq_topk(spark, path, QVEC, cents, cbs, k=5, pool=50)
    # ADC-only querying still works
    assert len(sim.ivfpq_topk_auto(spark, path, QVEC, k=5,
                                   pool=None).collect()) == 5


# ---------------------------------------------------------------------------
# r8: pq_encode strategy dispatch (literal vs numpy — the k_codes-dimension
# twin of assign_cells' scale path)
# ---------------------------------------------------------------------------

def test_pq_encode_methods_agree(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    lit = sim.pq_encode(emb, cbs, method="literal") \
        .select("vec_id", "pq_code").orderBy("vec_id").collect()
    npy = sim.pq_encode(emb, cbs, method="numpy") \
        .select("vec_id", "pq_code").orderBy("vec_id").collect()
    assert [tuple(r["pq_code"]) for r in lit] \
        == [tuple(r["pq_code"]) for r in npy]
    with pytest.raises(ValueError, match="method"):
        sim.pq_encode(emb, cbs, method="bogus")


def test_pq_encode_auto_dispatches_large_codebooks(spark, sf_dir):
    """k_codes=512 > 256: auto must take the numpy path, whose plan
    does not carry the codebook literals."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    import numpy as np

    rng = np.random.default_rng(23)
    big = [rng.random((512, 8)).tolist() for _ in range(8)]
    small = [rng.random((16, 8)).tolist() for _ in range(8)]
    p_big = sim.pq_encode(emb, big) \
        ._jdf.queryExecution().optimizedPlan().toString()
    p_small_npy = sim.pq_encode(emb, small, method="numpy") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert abs(len(p_big) - len(p_small_npy)) < 300  # flat in m*k_codes
    # and agreement holds at the large size too
    lit = sim.pq_encode(emb, big, method="literal") \
        .select("vec_id", "pq_code").orderBy("vec_id").collect()
    npy = sim.pq_encode(emb, big, method="numpy") \
        .select("vec_id", "pq_code").orderBy("vec_id").collect()
    assert [tuple(r["pq_code"]) for r in lit] \
        == [tuple(r["pq_code"]) for r in npy]


def test_pq_encode_edge_inputs_all_null_contract(spark):
    cbs = sim.pq_codebooks(4, m=2, k=4)
    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4]),   # valid
         (2, None),                    # null vector
         (3, [0.1, 0.2]),              # wrong length (one subspace)
         (4, [])],                     # empty
        "vec_id int, embedding array<double>")
    for method in ("literal", "numpy"):
        rows = sim.pq_encode(df, cbs, method=method) \
            .select("vec_id", "pq_code").orderBy("vec_id").collect()
        codes = {r["vec_id"]: list(r["pq_code"]) for r in rows}
        assert all(c is not None for c in codes[1]), method
        for vid in (2, 3, 4):
            assert codes[vid] == [None, None], (method, vid)


def test_pq_fit_encode_methods_agree(spark, sf_dir):
    """The training loop's literal and numpy assignment routes must
    produce identical codebooks (bit-for-bit: same argmin, same
    aggregation)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sim.pq_fit(emb, m=8, k=8, n_iter=2, dim=64,
                   encode_method="literal")
    b = sim.pq_fit(emb, m=8, k=8, n_iter=2, dim=64,
                   encode_method="numpy")
    assert len(a) == len(b) == 8
    for ba, bb in zip(a, b):
        for ca, cb in zip(ba, bb):
            assert ca == pytest.approx(cb, abs=1e-12)


def test_pq_fit_large_k_trains(spark, sf_dir):
    """k=300 > 256 dispatches to the numpy assignment; the trained
    books must have the right shape and actually quantize better than
    the seeds after iteration (inertia non-increasing is the Lloyd
    guarantee; spot-check shape + usability end-to-end)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = sim.pq_fit(emb, m=8, k=300, n_iter=1, dim=64)
    assert len(books) == 8
    assert all(len(b) == 300 and len(b[0]) == 8 for b in books)
    coded = sim.pq_encode(emb, books)  # auto -> numpy at k=300
    row = coded.select("pq_code").first()
    assert len(row["pq_code"]) == 8
    assert all(0 <= c < 300 for c in row["pq_code"])
