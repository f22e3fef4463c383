"""ANN quality as a CURVE, not a point (VERDICT r5 item 2): recall@10
of the IVF-PQ index across nprobe x re-rank-pool on the 200k-vector
corpus, for four index variants:

- ``md5+res``     — fixed md5-derived codebooks, residual encoding
                    (the oracle-checkable configuration)
- ``trained+res`` — kmeans_fit coarse cells + pq_fit codebooks,
                    residual encoding (the production configuration)
- ``trained``     — trained, residual OFF (isolates the residual win)
- ``opq+res``     — trained on OPQ-lite permuted vectors (isolates the
                    variance-balancing win)

Ground truth is the exact squared-L2 top-10 per query (brute force).
Queries are 8 corpus vectors chosen by smallest md5(vec_id || 'annq')
— hash-spread, deterministic, engine-reproducible.  Every (variant,
nprobe, pool) cell is ONE Spark job: the 8 per-query top-k plans union
into a single collect.

Also runs the seeding A/B (VERDICT item 3): final Lloyd inertia for
spread vs smallest_id seeding on the same corpus.

Usage: python scripts/ann_curve.py [base_sf_dir] [emb100_dir]
Prints one JSON line (committed as ANN_CURVE_r06.json).  Run SOLO.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DIM = 64
K_CELLS = 16
M, K_CODES = 8, 16
TOPK = 10
N_QUERIES = 8
NPROBES = [1, 2, 4, 8]
POOLS = [None, 40, 160]  # None = ADC-only (no exact re-rank)


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/emb100"
    gen = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gen_scale_corpus.py")
    if not os.path.isfile(os.path.join(x100, "embeddings.parquet",
                                       "_SUCCESS")):
        subprocess.run(
            [sys.executable, gen, "100", base, x100, "embeddings"],
            check=True,
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ann-curve")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(x100, "embeddings.parquet"))
    n_vectors = emb.count()

    # ---- deterministic hash-spread queries --------------------------------
    qrows = (
        emb.select("vec_id", "embedding",
                   F.md5(F.concat(F.col("vec_id").cast("string"),
                                  F.lit("annq"))).alias("h"))
        .orderBy("h", "vec_id").limit(N_QUERIES).collect()
    )
    queries = [(int(r["vec_id"]), [float(v) for v in r["embedding"]])
               for r in qrows]

    # ---- exact ground truth: one unioned brute-force job ------------------
    def exact_plan(qi, qvec):
        d = sim._sq_l2(F.col("embedding"), sim._qlit(qvec))
        return (emb.select(F.lit(qi).alias("qi"), "vec_id",
                           d.alias("d"))
                .orderBy("d", "vec_id").limit(TOPK))

    plans = [exact_plan(i, q) for i, (_, q) in enumerate(queries)]
    un = plans[0]
    for p in plans[1:]:
        un = un.unionAll(p)
    truth = {}
    for r in un.collect():
        truth.setdefault(int(r["qi"]), set()).add(int(r["vec_id"]))

    # ---- train quantizers -------------------------------------------------
    t0 = time.time()
    cents = sim.kmeans_fit(emb, k=K_CELLS, n_iter=5, dim=DIM)
    t_kmeans = time.time() - t0
    t0 = time.time()
    books_tr = sim.pq_fit(emb, m=M, k=K_CODES, n_iter=5, dim=DIM)
    t_pq = time.time() - t0
    books_md5 = sim.pq_codebooks(DIM, m=M, k=K_CODES)

    perm = sim.opq_permutation(emb, m=M, dim=DIM)
    emb_opq = emb.withColumn(
        "embedding", sim.permute_vec(F.col("embedding"), perm))
    # L2 is permutation-invariant: the trained coarse cells permute too
    cents_opq = [[c[i] for i in perm] for c in cents]
    books_opq = sim.pq_fit(emb_opq, m=M, k=K_CODES, n_iter=5, dim=DIM)

    # ---- seeding A/B ------------------------------------------------------
    cents_smallest = sim.kmeans_fit(emb, k=K_CELLS, n_iter=5, dim=DIM,
                                    seeding="smallest_id")
    seeding_ab = {
        "inertia_spread": round(sim.kmeans_inertia(emb, cents), 2),
        "inertia_smallest_id": round(
            sim.kmeans_inertia(emb, cents_smallest), 2),
    }

    # ---- write the four indexes ------------------------------------------
    scratch = os.path.join(os.path.dirname(x100), "ann_idx")
    variants = {
        "md5+res": (emb, cents, books_md5, True, None),
        "trained+res": (emb, cents, books_tr, True, None),
        "trained": (emb, cents, books_tr, False, None),
        "opq+res": (emb_opq, cents_opq, books_opq, True, perm),
    }
    paths = {}
    for name, (src, cs, bs, res, _) in variants.items():
        path = os.path.join(scratch, name.replace("+", "_"))
        sim.write_ivfpq(src, path, cs, bs, residual=res)
        paths[name] = path

    # ---- the curve --------------------------------------------------------
    curve = {}
    worst_ok = []
    for name, (_, cs, bs, res, vperm) in variants.items():
        for nprobe in NPROBES:
            for pool in POOLS:
                parts = []
                for qi, (_, qvec) in enumerate(queries):
                    q = [qvec[i] for i in vperm] if vperm else qvec
                    parts.append(
                        sim.ivfpq_topk(
                            spark, paths[name], q, cs, bs, k=TOPK,
                            nprobe=nprobe, residual=res, pool=pool,
                        ).select(F.lit(qi).alias("qi"), "vec_id")
                    )
                un = parts[0]
                for p in parts[1:]:
                    un = un.unionAll(p)
                t0 = time.time()
                got = {}
                for r in un.collect():
                    got.setdefault(int(r["qi"]), set()).add(
                        int(r["vec_id"]))
                el = time.time() - t0
                rec = sum(
                    len(got.get(qi, set()) & truth[qi]) / TOPK
                    for qi in range(len(queries))
                ) / len(queries)
                key = f"{name}|nprobe={nprobe}|pool={pool or 'adc'}"
                curve[key] = {"recall_at_10": round(rec, 4),
                              "sec_8_queries": round(el, 2)}
                worst_ok.append((rec, key))

    # ---- out-of-corpus queries: deterministic md5 jitter ------------------
    # corpus-member queries make top-1 trivial (the vector finds itself);
    # a perturbed query has NO exact match, so every pool candidate is a
    # genuine ADC ranking decision — the harder, more realistic regime.
    # Jitter calibration: vectors are unit-norm with nearest-neighbor
    # spacing ~0.042 on this corpus; amplitude 0.03/dim gives a jitter
    # norm ~0.14 ≈ 3x the NN spacing — out-of-corpus but in-distribution
    # (the first cut used 0.5/dim = jitter norm 2.3, i.e. pure noise
    # whose "true neighbors" are arbitrary — recall on noise measures
    # nothing).
    import hashlib as _h

    def _jit(qi, i):
        h = _h.md5(f"oov:{qi}:{i}".encode()).hexdigest()
        return (int(h[:8], 16) % 2001 - 1000) / 1000.0 * 0.03

    oov_queries = [
        (qi, [v + _jit(qi, i) for i, v in enumerate(qvec)])
        for qi, (_, qvec) in enumerate(queries)
    ]
    plans = []
    for qi, q in oov_queries:
        d = sim._sq_l2(F.col("embedding"), sim._qlit(q))
        plans.append(emb.select(F.lit(qi).alias("qi"), "vec_id",
                                d.alias("d"))
                     .orderBy("d", "vec_id").limit(TOPK))
    un = plans[0]
    for p in plans[1:]:
        un = un.unionAll(p)
    oov_truth = {}
    for r in un.collect():
        oov_truth.setdefault(int(r["qi"]), set()).add(int(r["vec_id"]))

    oov_curve = {}
    name = "trained+res"
    _, cs, bs, res, _ = variants[name]
    for nprobe in NPROBES:
        for pool in POOLS:
            parts = [
                sim.ivfpq_topk(spark, paths[name], q, cs, bs, k=TOPK,
                               nprobe=nprobe, residual=res, pool=pool)
                .select(F.lit(qi).alias("qi"), "vec_id")
                for qi, q in oov_queries
            ]
            un = parts[0]
            for p in parts[1:]:
                un = un.unionAll(p)
            got = {}
            for r in un.collect():
                got.setdefault(int(r["qi"]), set()).add(int(r["vec_id"]))
            rec = sum(
                len(got.get(qi, set()) & oov_truth[qi]) / TOPK
                for qi, _ in oov_queries
            ) / len(oov_queries)
            oov_curve[f"{name}|nprobe={nprobe}|pool={pool or 'adc'}"] = \
                round(rec, 4)

    # ---- r7: do the ivfpq_topk_auto DEFAULTS land in the safe region? -----
    # pool="auto" = 8*k*max(nprobe,2), coupled to nprobe; measured on the
    # production (trained+res) index for member AND out-of-corpus queries.
    name = "trained+res"
    auto_curve = {}
    member_q = [(qi, q) for qi, (_, q) in enumerate(queries)]
    for tag, qlist, tru in (("member", member_q, truth),
                            ("oov", oov_queries, oov_truth)):
        for nprobe in (2, 4):
            parts = [
                sim.ivfpq_topk_auto(spark, paths[name], q, k=TOPK,
                                    nprobe=nprobe)
                .select(F.lit(qi).alias("qi"), "vec_id")
                for qi, q in qlist
            ]
            un = parts[0]
            for p in parts[1:]:
                un = un.unionAll(p)
            got = {}
            for r in un.collect():
                got.setdefault(int(r["qi"]), set()).add(int(r["vec_id"]))
            rec = sum(
                len(got.get(qi, set()) & tru[qi]) / TOPK
                for qi, _ in qlist
            ) / len(qlist)
            auto_curve[f"auto|{tag}|nprobe={nprobe}"] = round(rec, 4)

    # ---- r7 stretch: OPQ on an energy-concentrated corpus -----------------
    # The base synthetic corpus has uniform per-dim variance, where a
    # variance-balancing permutation is a wash BY CONSTRUCTION (r6
    # finding).  Real embeddings are PCA-rotated-ish: energy concentrates
    # in leading dims.  Emulate that spectrum by scaling dim i with
    # 0.95^i, refit everything on the scaled corpus, and A/B plain-PQ vs
    # OPQ-permuted-PQ recall — the regime the permutation exists for.
    scale_lit = F.array(*[F.lit(0.95 ** i) for i in range(DIM)])
    emb_ec = emb.withColumn(
        "embedding",
        F.zip_with(F.col("embedding"), scale_lit, lambda v, s: v * s))
    cents_ec = sim.kmeans_fit(emb_ec, k=K_CELLS, n_iter=5, dim=DIM)
    books_ec = sim.pq_fit(emb_ec, m=M, k=K_CODES, n_iter=5, dim=DIM)
    perm_ec = sim.opq_permutation(emb_ec, m=M, dim=DIM)
    emb_ec_opq = emb_ec.withColumn(
        "embedding", sim.permute_vec(F.col("embedding"), perm_ec))
    cents_ec_opq = [[c[i] for i in perm_ec] for c in cents_ec]
    books_ec_opq = sim.pq_fit(emb_ec_opq, m=M, k=K_CODES, n_iter=5,
                              dim=DIM)
    ec_paths = {}
    for tag, (src, cs, bs) in {
        "ec_plain": (emb_ec, cents_ec, books_ec),
        "ec_opq": (emb_ec_opq, cents_ec_opq, books_ec_opq),
    }.items():
        p = os.path.join(scratch, tag)
        sim.write_ivfpq(src, p, cs, bs, residual=True)
        ec_paths[tag] = p
    ec_queries = [
        (qi, [v * (0.95 ** i) for i, v in enumerate(q)])
        for qi, q in member_q
    ]
    plans = []
    for qi, q in ec_queries:
        d = sim._sq_l2(F.col("embedding"), sim._qlit(q))
        plans.append(emb_ec.select(F.lit(qi).alias("qi"), "vec_id",
                                   d.alias("d"))
                     .orderBy("d", "vec_id").limit(TOPK))
    un = plans[0]
    for p in plans[1:]:
        un = un.unionAll(p)
    ec_truth = {}
    for r in un.collect():
        ec_truth.setdefault(int(r["qi"]), set()).add(int(r["vec_id"]))
    ec_curve = {}
    for tag in ("ec_plain", "ec_opq"):
        cs = cents_ec if tag == "ec_plain" else cents_ec_opq
        bs = books_ec if tag == "ec_plain" else books_ec_opq
        for pool in (None, 160):
            parts = []
            for qi, q in ec_queries:
                qq = ([q[i] for i in perm_ec] if tag == "ec_opq" else q)
                parts.append(
                    sim.ivfpq_topk(spark, ec_paths[tag], qq, cs, bs,
                                   k=TOPK, nprobe=2, residual=True,
                                   pool=pool)
                    .select(F.lit(qi).alias("qi"), "vec_id"))
            un = parts[0]
            for p in parts[1:]:
                un = un.unionAll(p)
            got = {}
            for r in un.collect():
                got.setdefault(int(r["qi"]), set()).add(int(r["vec_id"]))
            rec = sum(
                len(got.get(qi, set()) & ec_truth[qi]) / TOPK
                for qi, _ in ec_queries
            ) / len(ec_queries)
            ec_curve[f"{tag}|nprobe=2|pool={pool or 'adc'}"] = \
                round(rec, 4)

    low = sorted(k for r, k in worst_ok if r < 0.9)
    out = {
        "n_vectors": n_vectors, "dim": DIM, "k_cells": K_CELLS,
        "m": M, "k_codes": K_CODES, "n_queries": N_QUERIES,
        "kmeans_fit_sec": round(t_kmeans, 1),
        "pq_fit_sec": round(t_pq, 1),
        "seeding_ab": seeding_ab,
        "curve": curve,
        "oov_curve_trained_res": oov_curve,
        "auto_defaults_recall": auto_curve,
        "energy_concentrated_opq_ab": ec_curve,
        "configs_below_0.9_recall": low,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
