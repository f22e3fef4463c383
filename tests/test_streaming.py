"""Streaming surface tests: each streaming plan must agree with its
batch twin on the same (bounded) input, drained via availableNow."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark import streaming as st
from pydiverse_transform_spark.extras import events as ev

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".tmp_test")


@pytest.fixture(scope="module")
def event_source(spark, sf_dir):
    """A µs-timestamp parquet copy of the events table usable as a file
    stream source (the raw testdata is TIMESTAMP(NANOS), which the
    vectorized reader rejects)."""
    path = os.path.join(TMP, "events_stream_src")
    shutil.rmtree(path, ignore_errors=True)
    ev.load_events(spark, sf_dir).write.mode("overwrite").parquet(path)
    yield path
    shutil.rmtree(TMP, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, event_source):
    batch = spark.read.parquet(event_source)
    stream = st.read_event_stream(spark, event_source, schema=batch.schema)

    out = st.run_to_memory(
        st.tumbling_window_agg(
            stream, "ts", window="1 hour", watermark="0 seconds",
            keys=["event_type"],
            aggs={"n_events": "count(1)", "sum_value": "round(sum(value), 6)"},
        ),
        "tumbling_test", output_mode="complete",
    )

    expected = (
        batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.expr("count(1)").alias("n_events"),
             F.expr("round(sum(value), 6)").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    got = out.select("window_start", "event_type", "n_events", "sum_value")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_session_stream_runs(spark, event_source):
    batch = spark.read.parquet(event_source)
    stream = st.read_event_stream(spark, event_source, schema=batch.schema)
    out = st.run_to_memory(
        st.session_window_agg(
            stream, "ts", gap="30 minutes", watermark="0 seconds",
            keys=["user_id"], aggs={"n_events": "count(1)"},
        ),
        "session_test", output_mode="complete",
    )
    # session windows must cover every event exactly once
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == batch.count()
    # and per-user session boundaries must respect the gap: session count
    # per user equals the batch gap-based sessionization
    batch_sessions = (
        ev.sessionize(batch, "user_id", "ts", gap_minutes=30)
        .groupBy("user_id").agg(F.max("session_id").alias("n_sessions"))
    )
    stream_sessions = out.groupBy("user_id").count() \
        .withColumnRenamed("count", "n_sessions_stream")
    j = batch_sessions.join(stream_sessions, "user_id")
    mismatched = j.filter(
        F.col("n_sessions") != F.col("n_sessions_stream")
    ).count()
    assert mismatched == 0


def test_sliding_stream_runs(spark, event_source):
    batch = spark.read.parquet(event_source)
    stream = st.read_event_stream(spark, event_source, schema=batch.schema)
    out = st.run_to_memory(
        st.sliding_window_agg(
            stream, "ts", window="2 hours", slide="1 hour",
            watermark="0 seconds", aggs={"n_events": "count(1)"},
        ),
        "sliding_test", output_mode="complete",
    )
    # every event lands in exactly window/slide = 2 buckets
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * batch.count()


def test_stateful_sessionize_matches_batch(spark, event_source):
    batch = spark.read.parquet(event_source)
    stream = st.read_event_stream(spark, event_source, schema=batch.schema)
    out = st.run_to_memory(
        st.stateful_sessionize(stream, "user_id", "ts", gap_minutes=30),
        "stateful_sess_test",
    )
    expected = ev.sessionize(batch, "user_id", "ts", gap_minutes=30) \
        .select("event_id", "session_id")
    got = out.select("event_id", "session_id")
    assert got.count() == batch.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_file_sinks_roundtrip(spark, sf_dir):
    import pydiverse_transform_spark as pdt

    out_dir = os.path.join(TMP, "sink_roundtrip")
    shutil.rmtree(out_dir, ignore_errors=True)
    n = pdt.read_parquet(spark, f"{sf_dir}/nation.parquet")
    n >> pdt.write_parquet(out_dir, mode="overwrite",
                           partition_by=[n.n_regionkey])
    back = pdt.read_parquet(spark, out_dir)
    assert (back >> pdt.export(pdt.Pandas)).shape[0] == 25
    # partition column became a directory key
    assert any(p.startswith("n_regionkey=") for p in os.listdir(out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)


def test_write_stream_parquet_exactly_once(spark, sf_dir, tmp_path):
    """availableNow drain to a parquet sink, twice: the checkpoint must
    make the second run a no-op (exactly-once), and the sink rows must
    equal the batch equivalent."""
    import pydiverse_transform_spark.streaming as st
    from pydiverse_transform_spark.extras import events as ev

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = ev.load_events(spark, sf_dir).select("event_id", "user_id")
    batch.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    for _ in range(2):  # second drain must add nothing
        stream = st.read_event_stream(spark, src, schema=schema)
        q = st.write_stream_parquet(stream, out, ckpt, available_now=True)
        q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    assert sorted(got.columns) == sorted(batch.columns)


def test_dedup_stream_matches_batch_distinct(spark, event_source):
    """Streaming exact dedup: the surviving fingerprint set equals the
    batch DISTINCT fingerprint set, with each fingerprint exactly once
    (which row survives per fp is arrival-order-dependent by design)."""
    batch = spark.read.parquet(event_source)
    schema = batch.schema
    # a coarse fingerprint so real duplicates exist in the input
    fp = F.md5(F.concat_ws("|", F.col("event_type"),
                           F.floor(F.col("value") * 10).cast("string")))

    stream = st.read_event_stream(spark, event_source, schema=schema)
    out = st.run_to_memory(
        st.dedup_stream(stream, fp, ts_col="ts", watermark="365 days"),
        "dedup_stream_t",
    )
    got = out.withColumn("__fp", fp).groupBy("__fp").count()
    assert got.filter(F.col("count") > 1).count() == 0

    want_fps = {r[0] for r in
                batch.select(fp.alias("fp")).distinct().collect()}
    got_fps = {r[0] for r in got.select("__fp").collect()}
    assert got_fps == want_fps


def test_stream_interval_join_matches_batch(spark, event_source):
    """Stream-stream time-range join == batch interval_join on the same
    bounded input (clicks matched to errors up to 4h before them)."""
    import datetime as dt

    from pydiverse_transform_spark.extras.interval import interval_join

    batch = spark.read.parquet(event_source)
    schema = batch.schema

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click") \
            .select("event_id", "user_id", "ts")
        errors = df.filter(F.col("event_type") == "error") \
            .select(F.col("event_id").alias("error_id"), "user_id", "ts")
        return clicks, errors

    sclicks, serrors = sides(st.read_event_stream(
        spark, event_source, schema=schema))
    joined = st.stream_interval_join(
        sclicks, serrors, ts_col="ts", by=["user_id"], within="4 hours",
    ).select("event_id", "error_id")
    got = st.run_to_memory(joined, "t_ssj")
    got_pairs = sorted((r.event_id, r.error_id) for r in got.collect())

    bclicks, berrors = sides(batch)
    windows = berrors.select(
        "user_id", "error_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("w_end"),
    )
    expected = interval_join(
        bclicks.withColumn("ts", F.col("ts").cast("timestamp")),
        windows.withColumn("w_start", F.col("w_start").cast("timestamp"))
        .withColumn("w_end", F.col("w_end").cast("timestamp")),
        on="ts", start="w_start", end="w_end", by=["user_id"],
        bucket=dt.timedelta(hours=4),
    ).select("event_id", "error_id")
    exp_pairs = sorted((r.event_id, r.error_id) for r in expected.collect())
    assert got_pairs == exp_pairs
    assert len(got_pairs) > 0


def _time_ordered_files(spark, sf_dir, out_dir, n_files=8):
    """Split the events table into n_files parquet files in strict
    event-time order with increasing mtimes, so the file stream's
    availableNow replay consumes them as n_files micro-batches in
    time order (maxFilesPerTrigger=1)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    pdf = batch.orderBy("ts").toPandas()
    os.makedirs(out_dir, exist_ok=True)
    chunk = (len(pdf) + n_files - 1) // n_files
    now = time.time()
    for i in range(n_files):
        part = pdf.iloc[i * chunk:(i + 1) * chunk]
        path = os.path.join(out_dir, f"chunk{i:03d}.parquet")
        # pandas ns-timestamps -> µs so the stream schema (timestamp_ntz,
        # parquet TIMESTAMP(MICROS)) matches what the batch table uses
        pq.write_table(pa.Table.from_pandas(part), path,
                       coerce_timestamps="us", version="2.6",
                       allow_truncated_timestamps=True)
        os.utime(path, (now + i, now + i))
    return batch.schema


def test_watermark_evicts_window_state_across_batches(spark, sf_dir,
                                                      tmp_path):
    """The 100-TB-forever property: streaming state must be bounded by
    the watermark horizon, not by stream length.  30 days of events in
    8 time-ordered micro-batches aggregate into ~700 one-hour windows;
    at any batch boundary the state store may hold only the few windows
    still inside the 2h watermark — everything older is emitted and
    EVICTED (numRowsRemoved > 0, numRowsTotal plateaus ≪ total
    windows)."""
    src = str(tmp_path / "ev_stream_src")
    schema = _time_ordered_files(spark, sf_dir, src, n_files=8)

    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    agg = st.tumbling_window_agg(stream, window="1 hour",
                                 watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("evict_tumbling")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    progress = [p for p in q.recentProgress
                if p.get("stateOperators") and p["numInputRows"] > 0]
    assert len(progress) >= 3, f"want 3+ data micro-batches, got {progress}"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    removed = sum(p["stateOperators"][0]["numRowsRemoved"]
                  for p in progress)
    n_out = spark.table("evict_tumbling").count()

    # ~30 days of hourly windows emitted...
    assert n_out > 500, n_out
    # ...but state is bounded by ONE batch's window span (the watermark
    # used for eviction is the previous batch's max event time, so
    # eviction lags one micro-batch), NOT by the cumulative window count
    assert max(totals) < n_out / 4, (max(totals), n_out)
    # plateau: late batches hold no more state than early ones
    assert max(totals[-3:]) <= 1.5 * max(totals[:3]), totals
    # eviction actually happened (windows left the store after emitting)
    assert removed > 400, removed


def test_stateful_sessionize_state_scales_with_keys_not_length(
        spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionize keeps ONE state row per user:
    after every user has appeared, numRowsTotal plateaus at the
    distinct-user count and stays flat for all later batches no matter
    how many more events stream in."""
    src = str(tmp_path / "ev_sess_src")
    schema = _time_ordered_files(spark, sf_dir, src, n_files=6)

    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    sess = st.stateful_sessionize(stream, gap_minutes=30)
    q = (sess.writeStream.format("memory").queryName("evict_sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    progress = [p for p in q.recentProgress
                if p.get("stateOperators") and p["numInputRows"] > 0]
    assert len(progress) >= 3
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = batch.select("user_id").distinct().count()
    # plateaus at key cardinality; later batches add events, not state
    assert totals[-1] == n_users, (totals, n_users)
    assert max(totals) == n_users, (totals, n_users)
    # every event got a session id, exactly once
    assert spark.table("evict_sess").count() == batch.count()


def test_gopher_filter_on_stream_matches_batch(spark, sf_dir):
    """The Gopher quality gate is a stateless map-only predicate, so the
    SAME gopher_filter call must work unmodified on a readStream and
    keep exactly the batch twin's documents — the property that lets
    the quality gate run inside an ingestion stream instead of as a
    separate batch hop."""
    from pydiverse_transform_spark.extras import text as tx

    src = os.path.join(TMP, "docs_stream_src")
    shutil.rmtree(src, ignore_errors=True)
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch.write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        kw = dict(min_words=10, min_required_words=1)
        out = st.run_to_memory(
            tx.gopher_filter(stream, **kw).select("doc_id"),
            "gopher_stream_test", output_mode="append",
        )
        got = sorted(r["doc_id"] for r in out.collect())
        want = sorted(
            r["doc_id"]
            for r in tx.gopher_filter(batch, **kw).select("doc_id").collect()
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_simhash_neardup_matches_batch(spark, sf_dir):
    """Streaming near-dup by composition: dedup_stream keyed on a
    simhash fingerprint keeps the first document per 16-bit sketch —
    the same rows a batch simhash-distinct keeps (watermark wider than
    the corpus)."""
    from pyspark.sql import Window

    from pydiverse_transform_spark.extras import dedup as dd

    src = os.path.join(TMP, "docs_simhash_src")
    shutil.rmtree(src, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # documents need an event-time column for the watermark
    staged = docs.withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    staged.coalesce(1).write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = st.run_to_memory(
            st.neardup_stream(stream, "text", ts_col="ts",
                              watermark="800 hours", bits=16)
            .select("doc_id"),
            "simhash_stream_test", output_mode="append",
        )
        got = sorted(r["doc_id"] for r in out.collect())

        w = Window.partitionBy("sh").orderBy("doc_id")
        want = sorted(
            r["doc_id"]
            for r in dd.simhash_df(docs, "text", "doc_id", bits=16)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).collect()
        )
        assert got == want and 0 < len(got) <= docs.count()
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _late_mk(spark, rows):
    return (
        spark.createDataFrame(rows, "doc_id int, text string, sec long")
        .withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    )


def _late_replay(spark, src, files, name):
    """Write ``files`` (list of row-lists) as mod-time-ordered parquet
    dirs and drain them through neardup_stream one file per
    micro-batch — a deterministic shuffled-arrival replay."""
    import time

    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    for i, rows in enumerate(files):
        _late_mk(spark, rows).coalesce(1).write.parquet(f"{src}/f{i}")
        if i < len(files) - 1:
            time.sleep(1.05)  # file source orders batches by mod time
    schema = spark.read.parquet(f"{src}/f0").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(f"{src}/f*"))
    out = st.run_to_memory(
        st.neardup_stream(stream, "text", ts_col="ts",
                          watermark="1 hour", bits=16).select("doc_id"),
        name, output_mode="append",
    )
    return sorted(r["doc_id"] for r in out.collect())


def test_dedup_stream_late_arrival_contract(spark):
    """The drop/keep contract for watermark-late rows, asserted on a
    deterministic out-of-order replay (r6 verdict #6).  Three files /
    three micro-batches, watermark 1 hour:

    f0: doc1 @T0, doc2 @T0+10h  -> watermark advances to T0+9h
    f1: doc6 (fresh)            -> intervening batch; late filter for
                                   the NEXT batch now sits at T0+9h
    f2: doc3 = dup of doc1 @T0+5m, doc8 unique @T0+5m10s — both behind
        the previous batch's watermark -> DROPPED outright (neither
        emitted nor deduped), per the documented late-filter rule.
    Plus the guarantee side: doc7, a within-watermark dup of doc6,
    rides f2 and is suppressed."""
    T0 = 1_700_000_000
    got = _late_replay(
        spark, os.path.join(TMP, "late_contract_src"),
        [
            [(1, "hello world foo bar", T0),
             (2, "completely different content here", T0 + 36000)],
            [(6, "intervening heartbeat message xyz", T0 + 37800)],
            [(3, "hello world foo bar", T0 + 300),
             (8, "wholly original never before seen", T0 + 310),
             (7, "intervening heartbeat message xyz", T0 + 37860)],
        ],
        "late_contract_test",
    )
    # doc3/doc8 dropped (late), doc7 suppressed (guaranteed dedup)
    assert got == [1, 2, 6]


def test_dedup_stream_late_eviction_lag_window(spark):
    """The best-effort middle of the contract: in the batch IMMEDIATELY
    after the watermark jump, the late filter still holds the previous
    (lower) watermark, so late rows are processed — a late duplicate is
    suppressed by not-yet-evicted state while a late unique row passes
    through.  This is the one-batch eviction-lag window the docstring
    warns about."""
    T0 = 1_700_000_000
    got = _late_replay(
        spark, os.path.join(TMP, "late_lag_src"),
        [
            [(1, "hello world foo bar", T0),
             (2, "completely different content here", T0 + 36000)],
            [(3, "hello world foo bar", T0 + 300),          # late dup
             (4, "novel unique never seen words", T0 + 360),  # late new
             (5, "fresh in-window brand new doc", T0 + 37800)],
        ],
        "late_lag_test",
    )
    # doc3 suppressed (state alive until batch-end eviction), doc4
    # emitted (late filter lags one batch), doc5 fresh
    assert got == [1, 2, 4, 5]


def test_ivfpq_append_stream_extends_index(spark, sf_dir):
    """Streaming vectors appended into a write_ivfpq layout land in the
    same cell partition dirs with the same residual codes: querying the
    grown index equals querying a batch-rebuilt index over the union."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    cents = sim.hyperplanes(64, 8, seed="ivfpq")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    qvec = [((i * 37) % 101 - 50) / 50.0 for i in range(64)]

    idx = os.path.join(TMP, "ivfpq_stream_idx")
    staging = os.path.join(TMP, "ivfpq_stream_staging")
    src = os.path.join(TMP, "ivfpq_stream_src")
    ckpt = os.path.join(TMP, "ivfpq_stream_ckpt")
    for p in (idx, staging, src, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    sim.write_ivfpq(base, idx, cents, cbs, residual=True)
    extra.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = st.ivfpq_append_stream(stream, idx, staging, ckpt,
                               available_now=True)
    q.awaitTermination(120)

    grown = sim.ivfpq_topk_auto(spark, idx, qvec, k=10, nprobe=8,
                                pool=100,
                                extra_paths=[staging]).collect()
    rebuilt_path = os.path.join(TMP, "ivfpq_stream_rebuilt")
    shutil.rmtree(rebuilt_path, ignore_errors=True)
    sim.write_ivfpq(emb, rebuilt_path, cents, cbs, residual=True)
    rebuilt = sim.ivfpq_topk_auto(spark, rebuilt_path, qvec, k=10,
                                  nprobe=8, pool=100).collect()
    assert [tuple(r) for r in grown] == [tuple(r) for r in rebuilt]
    # the appended rows really went through the stream sink, into the
    # staging root; the base index is untouched
    assert spark.read.parquet(staging).count() == extra.count()
    assert spark.read.parquet(idx).count() == base.count()

    # maintenance fold: base + staging -> fresh compacted index whose
    # sidecar carries over and whose queries need no extra_paths
    folded = os.path.join(TMP, "ivfpq_stream_folded")
    shutil.rmtree(folded, ignore_errors=True)
    sim.ivfpq_fold_staging(spark, idx, staging, folded)
    assert spark.read.parquet(folded).count() == emb.count()
    after_fold = sim.ivfpq_topk_auto(spark, folded, qvec, k=10,
                                     nprobe=8, pool=100).collect()
    assert [tuple(r) for r in after_fold] == [tuple(r) for r in rebuilt]


def test_span_cut_stream_applies_reference_spans(spark, sf_dir):
    """span_cut_stream is a stateless map: every occurrence of a
    reference duplicated-span hash is cut from in-flight docs (no
    canonical election — the reference corpus holds the canonical), and
    docs sharing nothing with the reference pass through
    token-identically.  Streamed result must equal the same operator's
    batch run on the same input."""
    from pydiverse_transform_spark.extras.dedup import duplicate_spans

    ref = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "alpha beta gamma delta epsilon zeta"),  # dup -> spans
         (102, "one two three four five six")],
        "doc_id long, text string")
    dup = duplicate_spans(ref, window=4)
    assert dup.count() == 3  # 6-token dup span -> 3 sliding 4-windows

    incoming = [
        (1, "intro words alpha beta gamma delta epsilon zeta outro"),
        (2, "no shared content here at all today"),
        (3, None),
        (4, "alpha beta gamma delta"),   # exact 4-window -> fully cut
    ]
    src = os.path.join(TMP, "span_cut_src")
    shutil.rmtree(src, ignore_errors=True)
    batch = spark.createDataFrame(incoming, "doc_id long, text string")
    batch.write.mode("overwrite").parquet(src)
    try:
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = st.run_to_memory(
            st.span_cut_stream(stream, dup, window=4)
            .select("doc_id", "clean_text", "n_tokens_before",
                    "n_tokens_after"),
            "span_cut_stream_test", output_mode="append")
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
    finally:
        shutil.rmtree(src, ignore_errors=True)

    assert got[1]["clean_text"] == "intro words outro"
    assert got[1]["n_tokens_before"] == 9
    assert got[1]["n_tokens_after"] == 3
    assert got[2]["clean_text"] == "no shared content here at all today"
    assert got[3]["clean_text"] == "" and got[3]["n_tokens_before"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_tokens_after"] == 0

    # batch run of the same operator on the same input is identical
    batch_got = {r["doc_id"]: r.asDict()
                 for r in st.span_cut_stream(batch, dup, window=4)
                 .select("doc_id", "clean_text", "n_tokens_before",
                         "n_tokens_after").collect()}
    assert batch_got == got


def test_span_cut_stream_tokenizes_like_batch_tokens(spark):
    """The kernel's Python tokenizer must mirror extras.text.tokens
    EXACTLY (Java regex \\s = ASCII [ \\t\\n\\x0B\\f\\r]): a NBSP
    (U+00A0) is NOT a separator there, so 'gamma\\xa0delta' is one
    token and a reference span learned over the same text still
    matches.  Python's str.split() would split it and silently miss
    every span in such a doc."""
    from pydiverse_transform_spark.extras.dedup import duplicate_spans
    from pydiverse_transform_spark.extras.text import tokens

    text = "alpha beta gamma\xa0delta epsilon zeta eta theta"
    ref = spark.createDataFrame(
        [(100, text), (101, text)], "doc_id long, text string")
    # ground truth: Spark-side token count of the NBSP text
    n_spark = ref.select(F.array_size(tokens(F.col("text")))
                         .alias("n")).head()["n"]
    assert n_spark == 7  # NBSP glues gamma+delta into one token
    dup = duplicate_spans(ref, window=4)

    incoming = spark.createDataFrame(
        [(1, "x " + text + " y"),           # NBSP span present -> cut
         (2, "gamma delta epsilon zeta")],  # space-split twin: no match
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in st.span_cut_stream(incoming, dup, window=4)
           .select("doc_id", "clean_text", "n_tokens_before",
                   "n_tokens_after").collect()}
    assert got[1]["n_tokens_before"] == 9
    assert got[1]["clean_text"] == "x y"
    # the space-separated variant hashes different windows: untouched
    assert got[2]["clean_text"] == "gamma delta epsilon zeta"
    assert got[2]["n_tokens_after"] == 4


# ---------------------------------------------------------------------------
# r8: neardup_ingest_stream — micro-batch ingest dedup against a
# persisted MinHash-LSH index
# ---------------------------------------------------------------------------

def _write_one_file(spark, rows, path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(
        pdf.astype({"doc_id": "int64", "text": "string"}),
        preserve_index=False), path)


def _ingest_fixture(spark, tag):
    """Index over the even sf0.001 docs; returns (index_path, out, ckpt,
    src, docs)."""
    from pydiverse_transform_spark.extras import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = os.path.join(TMP, f"mh_ingest_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    idx = os.path.join(root, "idx")
    dedup.write_minhash_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx)
    return (idx, os.path.join(root, "out"), os.path.join(root, "ckpt"),
            os.path.join(root, "src"), docs)


def test_neardup_ingest_stream_snapshot_equals_batch(spark):
    """admit=False: the streamed result over any batching equals the
    batch neardup_filter_new on the same input (order-independent)."""
    from pydiverse_transform_spark.extras import dedup

    idx, out, ckpt, src, docs = _ingest_fixture(spark, "snap")
    inc = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in inc.collect()]
    # three files -> three micro-batches
    for i in range(3):
        _write_one_file(spark, rows[i::3], os.path.join(src, f"f{i}.parquet"))
    stream = st.read_event_stream(
        spark, src, schema=inc.schema, max_files_per_trigger=1)
    q = st.neardup_ingest_stream(stream, idx, out, ckpt,
                                 threshold=0.45, admit=False,
                                 available_now=True)
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    want = {r["doc_id"] for r in dedup.neardup_filter_new(
        spark, idx, inc, threshold=0.45).collect()}
    assert got == want
    # the batch partition column is exposed
    assert "batch" in spark.read.parquet(out).columns


def test_neardup_ingest_stream_cross_batch_admit(spark):
    """admit=True: a later batch's doc near-dups an EARLIER batch's
    admitted survivor and is dropped (first-come-wins across batches),
    while intra-batch dups both survive."""
    idx, out, ckpt, src, docs = _ingest_fixture(spark, "admit")
    novel = "zeppelin quartz vortex jackal osmium nimbus krypton fable"
    other = "velvet tundra orchid basalt meadow cinder prism dynamo"
    import time as _t
    # batch 1: two copies of a novel text (intra-batch dup) + one other
    _write_one_file(spark, [(9001, novel), (9002, novel), (9003, other)],
                    os.path.join(src, "b1.parquet"))
    _t.sleep(1.2)  # distinct mtime second -> deterministic batch order
    # batch 2: the same novel text again under a fresh id
    _write_one_file(spark, [(9004, novel)],
                    os.path.join(src, "b2.parquet"))
    schema = "doc_id long, text string"
    stream = st.read_event_stream(
        spark, src, schema=spark.createDataFrame([], schema).schema,
        max_files_per_trigger=1)
    q = st.neardup_ingest_stream(stream, idx, out, ckpt,
                                 threshold=0.9, admit=True,
                                 available_now=True)
    q.awaitTermination(120)
    surv = {r["doc_id"]: r["batch"]
            for r in spark.read.parquet(out).collect()}
    assert 9001 in surv and 9002 in surv      # intra-batch dups survive
    assert 9003 in surv
    assert 9004 not in surv                   # cross-batch dup dropped
    assert surv[9001] == surv[9002] == surv[9003] != None  # noqa: E711


def test_neardup_ingest_stream_replay_ignores_own_rows(spark):
    """Retry semantics: a batch whose rows were ALREADY admitted (crash
    after append, before checkpoint commit) must reproduce its original
    survivors, not drop them as self-near-dups — hits whose index_id is
    in the current batch are ignored."""
    from pydiverse_transform_spark.extras import dedup

    idx, out, ckpt, src, docs = _ingest_fixture(spark, "replay")
    novel = "quasar lattice ember fjord zenith cobalt rustle python"
    batch_rows = [(9101, novel), (9102, novel + " extra")]
    # simulate the half-committed state: the batch's own bucket rows are
    # already in the index under their final ids
    pre = spark.createDataFrame(batch_rows, "doc_id long, text string")
    dedup.minhash_index_append(spark, idx, pre)
    _write_one_file(spark, batch_rows, os.path.join(src, "b1.parquet"))
    stream = st.read_event_stream(
        spark, src, schema=pre.schema, max_files_per_trigger=1)
    q = st.neardup_ingest_stream(stream, idx, out, ckpt,
                                 threshold=0.9, admit=True,
                                 available_now=True)
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {9101, 9102}


# ---------------------------------------------------------------------------
# r8: semantic_ingest_stream — the embedding twin of neardup_ingest_stream
# ---------------------------------------------------------------------------

def _sem_ingest_fixture(spark, tag):
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    root = os.path.join(TMP, f"sem_ingest_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    idx = os.path.join(root, "idx")
    cents = sim.hyperplanes(64, 16, seed="efn")
    cbs = sim.pq_codebooks(64, m=8, k=16)
    sim.write_ivfpq(emb.filter(F.col("vec_id") % 4 != 0), idx, cents,
                    cbs, residual=True)
    return (idx, os.path.join(root, "out"), os.path.join(root, "ckpt"),
            os.path.join(root, "src"), emb)


def test_semantic_ingest_stream_snapshot_equals_batch(spark):
    """admit=False over any batching == the batch embedding_filter_new
    on the same input."""
    from pydiverse_transform_spark.extras import similarity as sim

    idx, out, ckpt, src, emb = _sem_ingest_fixture(spark, "snap")
    inc = emb.filter(F.col("vec_id") % 4 == 0)
    inc.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = st.read_event_stream(spark, src, schema=schema,
                                  max_files_per_trigger=1)
    q = st.semantic_ingest_stream(stream, idx, out, ckpt,
                                  threshold=0.4, n_probe=1,
                                  probe_margin=None, admit=False,
                                  available_now=True)
    assert q.awaitTermination(180)
    got = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    want = {r["vec_id"] for r in sim.embedding_filter_new(
        spark, idx, inc, threshold=0.4, n_probe=1,
        probe_margin=None).collect()}
    assert got == want and len(got) > 0


def test_semantic_ingest_stream_cross_batch_and_replay(spark):
    """admit=True: a later batch's vector near-dups an earlier batch's
    admitted survivor and drops; a pre-admitted batch (simulated crash
    between append and checkpoint commit) reproduces its survivors via
    the own-id exclusion."""
    import time as _t

    from pydiverse_transform_spark.extras import similarity as sim

    idx, out, ckpt, src, emb = _sem_ingest_fixture(spark, "admit")
    # a vector orthogonal-ish to the corpus: deterministic novel rows
    novel = [1.0 if i == 0 else 0.0 for i in range(64)]
    b1 = spark.createDataFrame([(9001, novel)],
                               "vec_id long, embedding array<double>")
    b2 = spark.createDataFrame([(9002, novel)],
                               "vec_id long, embedding array<double>")
    os.makedirs(src, exist_ok=True)
    b1.coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    _t.sleep(1.2)
    b2.coalesce(1).write.mode("overwrite").parquet(src + "/f2")
    schema = b1.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/f*"))
    q = st.semantic_ingest_stream(stream, idx, out, ckpt,
                                  threshold=0.999, n_probe=1,
                                  probe_margin=None, admit=True,
                                  available_now=True)
    assert q.awaitTermination(180)
    surv = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert 9001 in surv          # first arrival admitted
    assert 9002 not in surv      # identical later vector dropped
    # replay semantics: 9001's rows are in the index; a rerun of its
    # batch (fresh checkpoint) must keep 9001 (own-id exclusion), and
    # still drop 9002 against it
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1")
               .parquet(src + "/f*"))
    q2 = st.semantic_ingest_stream(stream2, idx, out, ckpt,
                                   threshold=0.999, n_probe=1,
                                   probe_margin=None, admit=True,
                                   available_now=True)
    assert q2.awaitTermination(180)
    surv2 = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert surv2 == {9001}


def test_ivfpq_append_stream_aligns_vector_type(spark, tmp_path):
    """A double-typed vector stream staged against a float index must
    stage as float: a widened staging root would silently grow the
    whole index to array<double> at the next maintenance fold — a
    permanent 2x storage/scan cost on the dominant column."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")  # array<float>
    cents = sim.hyperplanes(64, 4, seed="aln")
    cbs = sim.pq_codebooks(64, m=4, k=8)
    idx = str(tmp_path / "idx")
    stg = str(tmp_path / "stg")
    src = str(tmp_path / "src")
    sim.write_ivfpq(emb.filter(F.col("vec_id") % 2 == 0), idx, cents,
                    cbs, residual=False)
    # the arriving stream is DOUBLE-typed (e.g. computed upstream)
    emb.filter(F.col("vec_id") % 2 == 1) \
        .withColumn("embedding", F.col("embedding").cast("array<double>")) \
        .write.parquet(src)
    stream = st.read_event_stream(
        spark, src, schema=spark.read.parquet(src).schema)
    q = st.ivfpq_append_stream(stream, idx, stg,
                               str(tmp_path / "ckpt"),
                               available_now=True)
    assert q.awaitTermination(120)
    assert dict(spark.read.parquet(stg).dtypes)["embedding"] \
        == "array<float>"
    # and the fold keeps the index at its original type
    sim.ivfpq_maintain(spark, idx, stg)
    folded = spark.read.parquet(idx)
    assert dict(folded.dtypes)["embedding"] == "array<float>"
    assert folded.count() == emb.count()


def test_semantic_ingest_maintain_hook_folds_replay_duplicates(spark):
    """r9 (VERDICT r8 wrong #5): maintain_every compacts the index
    in-stream with duplicate-id removal, so an at-least-once replay
    that re-appends admitted rows leaves no duplicate candidates in
    top-k over the same index."""
    import time as _t

    from pydiverse_transform_spark.extras import similarity as sim

    idx, out, ckpt, src, emb = _sem_ingest_fixture(spark, "maint")
    novel = [1.0 if i == 0 else 0.0 for i in range(64)]
    novel2 = [0.0 if i != 1 else -1.0 for i in range(64)]
    b1 = spark.createDataFrame([(9001, novel)],
                               "vec_id long, embedding array<double>")
    b2 = spark.createDataFrame([(9002, novel2)],
                               "vec_id long, embedding array<double>")
    os.makedirs(src, exist_ok=True)
    b1.coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    _t.sleep(1.2)
    b2.coalesce(1).write.mode("overwrite").parquet(src + "/f2")
    schema = b1.schema

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/f*"))
        q = st.semantic_ingest_stream(stream, idx, out, ckpt,
                                      threshold=0.999, n_probe=1,
                                      probe_margin=None, admit=True,
                                      maintain_every=1,
                                      available_now=True)
        assert q.awaitTermination(240)

    run()
    base_rows = spark.read.parquet(idx).count()
    # full replay: fresh checkpoint, same input -> both batches re-run,
    # re-append their survivors, and the hook folds the dups away
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    run()
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == base_rows   # replay added NO net rows
    dup_ids = (idx_df.groupBy("vec_id").count()
               .filter(F.col("count") > 1).count())
    assert dup_ids == 0
    # top-k near the admitted novel vector: one candidate per id
    top = sim.ivfpq_topk_auto(spark, idx, novel, k=5).collect()
    ids = [r["vec_id"] for r in top]
    assert len(ids) == len(set(ids))
    assert ids[0] == 9001
    # survivors unchanged by the maintenance (both novel rows admitted,
    # and the replay reproduced them)
    surv = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert surv == {9001, 9002}


def test_ivfpq_maintain_dedup_ids_base_only(spark, tmp_path):
    """staging_path=None + dedup_ids=True: a manual duplicate append
    folds down to one row per id and the sidecar survives the swap."""
    from pydiverse_transform_spark.extras import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.hyperplanes(64, 4, seed="dd")
    cbs = sim.pq_codebooks(64, m=4, k=8)
    idx = str(tmp_path / "idx")
    sim.write_ivfpq(emb, idx, cents, cbs, residual=True)
    n = emb.count()
    # simulate an at-least-once replay: append a slice of the SAME rows
    dup = sim.ivfpq_encode(
        emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding"),
        cents, cbs, vec_col="embedding", residual=True,
        store_vectors=True)
    dup.write.mode("append").partitionBy("cell").parquet(idx)
    assert spark.read.parquet(idx).count() > n
    stats = sim.ivfpq_maintain(spark, idx, None, dedup_ids=True)
    assert stats["recovered"] is None
    folded = spark.read.parquet(idx)
    assert folded.count() == n
    assert folded.groupBy("vec_id").count() \
        .filter(F.col("count") > 1).count() == 0
    # sidecar carried over: path-only querying still works
    assert sim.read_ivfpq_meta(spark, idx)["n_cells"] == 4


def test_neardup_ingest_maintain_hook_folds_replay_duplicates(spark):
    """r9: maintain_every on the minhash ingest stream — a full replay
    re-appends every admitted batch's bucket rows; the hook folds the
    duplicates away, leaving one row per (doc, band) and unchanged
    filtering."""
    from pydiverse_transform_spark.extras import dedup

    idx, out, ckpt, src, docs = _ingest_fixture(spark, "maint9")
    novel1 = "quasar lattice ember fjord zenith cobalt rustle python"
    novel2 = "meadow cipher violet tundra orbit ledger puffin stanza"
    _write_one_file(spark, [(9201, novel1)],
                    os.path.join(src, "b1.parquet"))
    import time as _t
    _t.sleep(1.2)
    _write_one_file(spark, [(9202, novel2)],
                    os.path.join(src, "b2.parquet"))
    schema = "doc_id long, text string"

    def run():
        stream = st.read_event_stream(
            spark, src,
            schema=spark.read.parquet(src + "/b1.parquet").schema,
            max_files_per_trigger=1)
        q = st.neardup_ingest_stream(stream, idx, out, ckpt,
                                     threshold=0.7, admit=True,
                                     maintain_every=1,
                                     available_now=True)
        assert q.awaitTermination(240)

    run()
    base_rows = spark.read.parquet(idx).count()
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    run()   # full replay: re-appends, hook folds
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == base_rows
    assert idx_df.groupBy("doc_id", "band").count() \
        .filter(F.col("count") > 1).count() == 0
    surv = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert surv == {9201, 9202}
    # the folded index still matches future arrivals of the admitted docs
    probe = spark.createDataFrame([(9301, novel1)], schema)
    hits = dedup.minhash_index_lookup(spark, idx, probe, threshold=0.9)
    assert {r["index_id"] for r in hits.collect()} == {9201}
