"""Streaming crash-recovery SOAK (r11, VERDICT r10 next #7): prove the
r10 recover-at-construction preamble at scale, in fresh processes.

Per lane (minhash / neardup docs, ivfpq / semantic embeddings):

1. ``prep``      — base index built from the sf100 scale corpus
   (5M docs / 2M embeddings) minus a held-out increment slice; the
   increment staged as 4 single-file micro-batches; the base index
   cloned so the two runs start byte-identical.
2. ``run_u``     — FRESH PROCESS: uninterrupted ingest stream over all
   4 batches, ``admit=True, maintain_every=2`` (in-stream journaled
   compaction fires at batch 1 and 3).
3. ``crash_a``   — FRESH PROCESS: same stream over the first 2 batches
   only (maintain at batch 1 completes), then the process dies with
   the index in the MID-SWAP state — journal written, index renamed to
   ``.__old``, complete ``.__new`` present, ``os._exit(1)`` with no
   cleanup.  This is the exact state a kill between the journal
   protocol's two renames leaves (the window is a pair of directory
   renames, far too narrow to hit with an external kill -9 at will —
   the state is manufactured AT the protocol point instead, same as
   tests/test_r10_fixes.py, then the process genuinely hard-exits).
4. ``crash_b``   — FRESH PROCESS: batches 3-4 arrive, the stream is
   RESTARTED from its checkpoint; the constructor's journal-recovery
   preamble must roll the index forward before the meta read, then the
   stream drains normally (maintain fires again at batch 3).
5. ``verify``    — FRESH PROCESS: no journal/.__old/.__new survivors;
   survivor outputs of the two runs equal; index logical content
   equal (id sets + bucket-row counts); LOOKUP results against both
   indexes equal on a held-out probe slice.

Usage: python scripts/bench_stream_recovery.py [out_json]   # run SOLO
(each phase is executed in its own interpreter/JVM via subprocess)
Internal:  python scripts/bench_stream_recovery.py --phase <lane>:<phase>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# the soak corpus (override for a small-scale smoke run)
SF_DIR = os.environ.get("SPARK_GRAFT_SOAK_DIR",
                        os.path.join(REPO, ".scratch", "sf100"))
ROOT = os.path.join(REPO, ".scratch", "stream_recovery")

N_BATCHES = 4
MAINTAIN_EVERY = 2


def _spark(app):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _lane_dirs(lane):
    base = os.path.join(ROOT, lane)
    return {
        "base": base,
        "files": os.path.join(base, "files"),       # staged batch files
        "src_u": os.path.join(base, "src_u"),
        "src_c": os.path.join(base, "src_c"),
        "idx0": os.path.join(base, "idx0"),          # pristine base index
        "idx_u": os.path.join(base, "idx_u"),
        "idx_c": os.path.join(base, "idx_c"),
        "out_u": os.path.join(base, "out_u"),
        "out_c": os.path.join(base, "out_c"),
        "ckpt_u": os.path.join(base, "ckpt_u"),
        "ckpt_c": os.path.join(base, "ckpt_c"),
    }


def _stage_batch_files(df, files_dir, n):
    """Write n single-file parquet batches with strictly increasing
    mtimes (the file source orders batches by mtime, then path)."""
    import glob

    os.makedirs(files_dir, exist_ok=True)
    for i in range(n):
        part_dir = files_dir + f".__part{i}"
        df.filter(f"__slot = {i}").drop("__slot") \
            .coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        dst = os.path.join(files_dir, f"{i:02d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (1700000000 + i, 1700000000 + i))


def _move_batches(files_dir, src_dir, idxs):
    os.makedirs(src_dir, exist_ok=True)
    for i in idxs:
        shutil.copy2(os.path.join(files_dir, f"{i:02d}.parquet"),
                     os.path.join(src_dir, f"{i:02d}.parquet"))


def _crash_mid_swap(spark, path, journal_body):
    """Manufacture the exact between-renames state of the journaled
    swap protocol (journal present, complete .__new, index at .__old,
    nothing at the index path) — see module doc step 3."""
    from pydiverse_transform_spark.extras.util import fs_write_json

    fs_write_json(spark, path + ".__swap", journal_body)
    shutil.copytree(path, path + ".__new")
    shutil.move(path, path + ".__old")


# ---------------------------------------------------------------------------
# minhash lane
# ---------------------------------------------------------------------------

def _mh_inc_filter(F):
    return F.col("doc_id") % 2000 == 0          # 2500 docs / 4 batches


def mh_prep():
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup

    d = _lane_dirs("minhash")
    shutil.rmtree(d["base"], ignore_errors=True)
    spark = _spark("soak-mh-prep")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    inc = docs.filter(_mh_inc_filter(F)).withColumn(
        "__slot", (F.col("doc_id") / 2000 % N_BATCHES).cast("int"))
    corpus = docs.filter(~_mh_inc_filter(F))
    t0 = time.time()
    dedup.write_minhash_index(corpus, d["idx0"])
    build = round(time.time() - t0, 1)
    _stage_batch_files(inc, d["files"], N_BATCHES)
    shutil.copytree(d["idx0"], d["idx_u"])
    shutil.copytree(d["idx0"], d["idx_c"])
    n = corpus.count()
    ni = inc.count()
    spark.stop()
    print(json.dumps({"corpus_docs": n, "increment_docs": ni,
                      "build_sec": build}))


def _mh_stream(spark, src, idx, out, ckpt):
    from pydiverse_transform_spark import streaming as st

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = st.neardup_ingest_stream(
        stream, idx, out, ckpt, threshold=0.45, admit=True,
        maintain_every=MAINTAIN_EVERY, available_now=True)
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("minhash ingest drain exceeded 1800s")


def mh_run_u():
    d = _lane_dirs("minhash")
    _move_batches(d["files"], d["src_u"], range(N_BATCHES))
    spark = _spark("soak-mh-u")
    t0 = time.time()
    _mh_stream(spark, d["src_u"], d["idx_u"], d["out_u"], d["ckpt_u"])
    spark.stop()
    print(json.dumps({"sec": round(time.time() - t0, 1)}))


def mh_crash_a():
    d = _lane_dirs("minhash")
    _move_batches(d["files"], d["src_c"], range(N_BATCHES // 2))
    spark = _spark("soak-mh-crash-a")
    t0 = time.time()
    _mh_stream(spark, d["src_c"], d["idx_c"], d["out_c"], d["ckpt_c"])
    _crash_mid_swap(spark, d["idx_c"], {"index": d["idx_c"]})
    print(json.dumps({"sec": round(time.time() - t0, 1),
                      "mid_swap_state": True}))
    sys.stdout.flush()
    os._exit(1)                                  # hard death, no cleanup


def mh_crash_b():
    d = _lane_dirs("minhash")
    _move_batches(d["files"], d["src_c"],
                  range(N_BATCHES // 2, N_BATCHES))
    pre = {"journal": os.path.exists(d["idx_c"] + ".__swap"),
           "index_dir": os.path.exists(d["idx_c"])}
    spark = _spark("soak-mh-crash-b")
    t0 = time.time()
    _mh_stream(spark, d["src_c"], d["idx_c"], d["out_c"], d["ckpt_c"])
    spark.stop()
    print(json.dumps({
        "sec": round(time.time() - t0, 1),
        "pre_restart": pre,
        "post": {"journal": os.path.exists(d["idx_c"] + ".__swap"),
                 "index_dir": os.path.exists(d["idx_c"])},
    }))


def mh_verify():
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import dedup

    d = _lane_dirs("minhash")
    spark = _spark("soak-mh-verify")
    res = {"no_swap_survivors": not any(
        os.path.exists(d["idx_c"] + s)
        for s in (".__swap", ".__new", ".__old"))}

    surv_u = {r[0] for r in spark.read.parquet(d["out_u"])
              .select("doc_id").collect()}
    surv_c = {r[0] for r in spark.read.parquet(d["out_c"])
              .select("doc_id").collect()}
    res["survivors_equal"] = surv_u == surv_c
    res["n_survivors"] = len(surv_u)

    iu = spark.read.parquet(d["idx_u"])
    ic = spark.read.parquet(d["idx_c"])
    res["index_ids_equal"] = (
        iu.select("doc_id").distinct().exceptAll(
            ic.select("doc_id").distinct()).isEmpty()
        and ic.select("doc_id").distinct().exceptAll(
            iu.select("doc_id").distinct()).isEmpty())
    res["index_logical_rows"] = [
        iu.select("doc_id", "band").distinct().count(),
        ic.select("doc_id", "band").distinct().count()]
    res["index_logical_rows_equal"] = (
        res["index_logical_rows"][0] == res["index_logical_rows"][1])

    # user-visible contract: identical lookup results on a held-out
    # probe slice (never streamed) against both indexes
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    probe = docs.filter(F.col("doc_id") % 2000 == 7)

    def hits(idx):
        return sorted(
            (r[0], r[1], r[2]) for r in dedup.minhash_index_lookup(
                spark, idx, probe, threshold=0.45).collect())

    hu, hc = hits(d["idx_u"]), hits(d["idx_c"])
    res["lookup_equal"] = hu == hc
    res["n_lookup_hits"] = len(hu)
    res["ok"] = all(res[k] for k in
                    ("no_swap_survivors", "survivors_equal",
                     "index_ids_equal", "index_logical_rows_equal",
                     "lookup_equal"))
    spark.stop()
    print(json.dumps(res))


# ---------------------------------------------------------------------------
# semantic (ivfpq) lane
# ---------------------------------------------------------------------------

def _sem_models():
    from pydiverse_transform_spark.extras import similarity as sim

    cents = sim.hyperplanes(64, 64, seed="soak-r11")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    return cents, cbs


def sem_prep():
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    d = _lane_dirs("semantic")
    shutil.rmtree(d["base"], ignore_errors=True)
    spark = _spark("soak-sem-prep")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    inc = emb.filter(F.col("vec_id") % 500 == 0) \
        .select("vec_id", "embedding") \
        .withColumn("__slot",
                    (F.col("vec_id") / 500 % N_BATCHES).cast("int"))
    corpus = emb.filter(F.col("vec_id") % 500 != 0)
    cents, cbs = _sem_models()
    t0 = time.time()
    sim.write_ivfpq(corpus, d["idx0"], cents, cbs, residual=True,
                    store_vectors=True)
    build = round(time.time() - t0, 1)
    _stage_batch_files(inc, d["files"], N_BATCHES)
    shutil.copytree(d["idx0"], d["idx_u"])
    shutil.copytree(d["idx0"], d["idx_c"])
    n, ni = corpus.count(), inc.count()
    spark.stop()
    print(json.dumps({"corpus_vecs": n, "increment_vecs": ni,
                      "build_sec": build}))


def _sem_stream(spark, src, idx, out, ckpt):
    from pydiverse_transform_spark import streaming as st

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = st.semantic_ingest_stream(
        stream, idx, out, ckpt, threshold=0.99, n_probe=1,
        probe_margin=None, admit=True,
        maintain_every=MAINTAIN_EVERY, available_now=True)
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("semantic ingest drain exceeded 1800s")


def sem_run_u():
    d = _lane_dirs("semantic")
    _move_batches(d["files"], d["src_u"], range(N_BATCHES))
    spark = _spark("soak-sem-u")
    t0 = time.time()
    _sem_stream(spark, d["src_u"], d["idx_u"], d["out_u"], d["ckpt_u"])
    spark.stop()
    print(json.dumps({"sec": round(time.time() - t0, 1)}))


def sem_crash_a():
    d = _lane_dirs("semantic")
    _move_batches(d["files"], d["src_c"], range(N_BATCHES // 2))
    spark = _spark("soak-sem-crash-a")
    t0 = time.time()
    _sem_stream(spark, d["src_c"], d["idx_c"], d["out_c"], d["ckpt_c"])
    _crash_mid_swap(spark, d["idx_c"],
                    {"index": d["idx_c"], "staging": None,
                     "checkpoint": None})
    print(json.dumps({"sec": round(time.time() - t0, 1),
                      "mid_swap_state": True}))
    sys.stdout.flush()
    os._exit(1)


def sem_crash_b():
    d = _lane_dirs("semantic")
    _move_batches(d["files"], d["src_c"],
                  range(N_BATCHES // 2, N_BATCHES))
    pre = {"journal": os.path.exists(d["idx_c"] + ".__swap"),
           "index_dir": os.path.exists(d["idx_c"])}
    spark = _spark("soak-sem-crash-b")
    t0 = time.time()
    _sem_stream(spark, d["src_c"], d["idx_c"], d["out_c"], d["ckpt_c"])
    spark.stop()
    print(json.dumps({
        "sec": round(time.time() - t0, 1),
        "pre_restart": pre,
        "post": {"journal": os.path.exists(d["idx_c"] + ".__swap"),
                 "index_dir": os.path.exists(d["idx_c"])},
    }))


def sem_verify():
    from pyspark.sql import functions as F

    from pydiverse_transform_spark.extras import similarity as sim

    d = _lane_dirs("semantic")
    spark = _spark("soak-sem-verify")
    res = {"no_swap_survivors": not any(
        os.path.exists(d["idx_c"] + s)
        for s in (".__swap", ".__new", ".__old"))}

    surv_u = {r[0] for r in spark.read.parquet(d["out_u"])
              .select("vec_id").collect()}
    surv_c = {r[0] for r in spark.read.parquet(d["out_c"])
              .select("vec_id").collect()}
    res["survivors_equal"] = surv_u == surv_c
    res["n_survivors"] = len(surv_u)

    iu = spark.read.parquet(d["idx_u"])
    ic = spark.read.parquet(d["idx_c"])
    res["index_ids_equal"] = (
        iu.select("vec_id").distinct().exceptAll(
            ic.select("vec_id").distinct()).isEmpty()
        and ic.select("vec_id").distinct().exceptAll(
            iu.select("vec_id").distinct()).isEmpty())
    res["index_rows"] = [iu.select("vec_id").distinct().count(),
                         ic.select("vec_id").distinct().count()]

    # lookup contract on a held-out probe slice: the same arrivals
    # must survive filtering against both indexes
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    probe = emb.filter(F.col("vec_id") % 500 == 7) \
        .select("vec_id", "embedding")

    def survivors(idx):
        return sorted(r[0] for r in sim.embedding_filter_new(
            spark, idx, probe, threshold=0.99, n_probe=1,
            probe_margin=None).select("vec_id").collect())

    su, sc = survivors(d["idx_u"]), survivors(d["idx_c"])
    res["lookup_equal"] = su == sc
    res["n_lookup_survivors"] = len(su)
    res["ok"] = all(res[k] for k in
                    ("no_swap_survivors", "survivors_equal",
                     "index_ids_equal", "lookup_equal"))
    spark.stop()
    print(json.dumps(res))


PHASES = {
    "minhash": [("prep", mh_prep), ("run_u", mh_run_u),
                ("crash_a", mh_crash_a), ("crash_b", mh_crash_b),
                ("verify", mh_verify)],
    "semantic": [("prep", sem_prep), ("run_u", sem_run_u),
                 ("crash_a", sem_crash_a), ("crash_b", sem_crash_b),
                 ("verify", sem_verify)],
}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        lane, phase = sys.argv[2].split(":")
        dict(PHASES[lane])[phase]()
        return

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    result = {"metric": "stream_crash_recovery_soak",
              "corpus": SF_DIR, "n_batches": N_BATCHES,
              "maintain_every": MAINTAIN_EVERY,
              "crash": ("mid-swap state manufactured at the journal "
                        "protocol's between-renames point, then hard "
                        "os._exit(1); restart in a FRESH process"),
              "lanes": {}}
    for lane, phases in PHASES.items():
        lane_res = {}
        for phase, _fn in phases:
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--phase", f"{lane}:{phase}"],
                capture_output=True, text=True)
            expect_fail = phase == "crash_a"
            ok_exit = (p.returncode == 1) if expect_fail \
                else (p.returncode == 0)
            last = (p.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                parsed = json.loads(last)
            except json.JSONDecodeError:
                parsed = {"unparsed_tail": last[-500:]}
            lane_res[phase] = {"exit_ok": ok_exit,
                               "wall_sec": round(time.time() - t0, 1),
                               **parsed}
            print(f"  {lane}:{phase} -> {lane_res[phase]}",
                  file=sys.stderr)
            if not ok_exit:
                lane_res[phase]["stderr_tail"] = p.stderr[-1500:]
                break
        lane_res["ok"] = bool(lane_res.get("verify", {}).get("ok"))
        result["lanes"][lane] = lane_res
    result["ok"] = all(v["ok"] for v in result["lanes"].values())
    line = json.dumps(result)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    print(line)
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
