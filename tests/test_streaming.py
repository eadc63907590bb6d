"""Structured Streaming: incremental ingest equals batch; checkpoint resume."""

import shutil

from pyspark.sql import functions as F

from kg.fused import fused_extract_triples
from kg.streaming import stream_extract_triples
from tests.conftest import SF_DIR


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drop half the corpus, stream it
    flat = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    flat.filter(F.col("doc_id") < 250).write.parquet(in_dir)
    q = stream_extract_triples(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)

    got_half = spark.read.parquet(out_dir).count()
    want_half = fused_extract_triples(spark, SF_DIR).filter(
        F.col("doc_id") < "doc-0000250"
    ).count()
    assert got_half == want_half

    # drop the second half into the SAME dir; restart from checkpoint —
    # only the new files are processed (streaming resume)
    flat.filter(F.col("doc_id") >= 250).write.mode("append").parquet(in_dir)
    q2 = stream_extract_triples(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    want = fused_extract_triples(spark, SF_DIR)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    shutil.rmtree(ckpt, ignore_errors=True)


def test_incremental_kg_equals_batch(spark, tmp_path):
    """Full incremental KG construction (extract+link+canonicalize per
    micro-batch via foreachBatch) over two drops equals the batch
    pipeline's edges."""
    from kg.pipeline import run_pipeline
    from kg.streaming import stream_kg_edges

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "edges_stream")
    ckpt = str(tmp_path / "ckpt2")

    flat = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    flat.filter(F.col("doc_id") < 250).write.parquet(in_dir)
    stream_kg_edges(spark, in_dir, out_dir, ckpt).awaitTermination(300)
    flat.filter(F.col("doc_id") >= 250).write.mode("append").parquet(in_dir)
    stream_kg_edges(spark, in_dir, out_dir, ckpt).awaitTermination(300)

    batch_out = str(tmp_path / "batch")
    run_pipeline(spark, SF_DIR, batch_out, extractor="fused")
    got = spark.read.parquet(out_dir)
    want = spark.read.parquet(f"{batch_out}/edges").select(
        "subj_id", "pred", "obj_id", "doc_id", "offset"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stateful_dedup_ttl_actually_expires(spark, tmp_path):
    """ProcessingTimeTimeout under a real clock (round-2 VERDICT item 9:
    the TTL path was code-complete but never end-to-end asserted through
    an expiry). Three micro-batches: (1) doc 1 seen; (2) after the TTL
    deadline, a batch with OTHER keys fires the timeout and removes doc
    1's state; (3) doc 1 arrives again and — state expired — is emitted a
    SECOND time. Spark only evaluates timeouts while processing a batch,
    hence the intermediate batch; that's exactly how a continuous stream
    behaves (there's always a next batch)."""
    import time

    from kg.streaming import stateful_dedup_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ttl_min = 4 / 60  # 4 seconds

    def run_batch(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(in_dir)
        src = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
        q = stateful_dedup_stream(src, out_dir, ckpt, state_ttl_minutes=ttl_min)
        q.awaitTermination(120)

    run_batch([(1, "first")])
    assert spark.read.parquet(out_dir).count() == 1

    time.sleep(6)  # > TTL: doc 1's deadline has passed
    run_batch([(99, "other")])  # fires the timeout -> doc 1 state removed

    run_batch([(1, "second")])  # same key, after expiry -> emitted again
    got = spark.read.parquet(out_dir)
    texts = sorted(r.text for r in got.filter("doc_id = 1").collect())
    assert texts == ["first", "second"], texts
    # the within-TTL guarantee still held for doc 99 (emitted once)
    assert got.filter("doc_id = 99").count() == 1


def test_streaming_embed_equals_batch(spark, tmp_path):
    """The text->embedding encoder is a stateless per-row expression, so
    it runs UNCHANGED inside a Structured Streaming micro-batch — the
    enrichment pipeline's streaming twin (encode documents as they
    arrive). Stream output must equal the batch embedding of the same
    corpus."""
    from kg.ops.embed import embed_documents, embed_text_col

    src_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"tok{i % 7} alpha beta tok{i % 3}") for i in range(40)],
        "doc_id long, text string",
    ).write.parquet(f"{src_dir}/documents.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(f"{src_dir}/documents.parquet")
        .select("doc_id", embed_text_col(F.col("text")).alias("v"))
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: list(r.v)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        r.doc_id: list(r.v) for r in embed_documents(spark, src_dir).collect()
    }
    assert got == want and len(got) == 40


def test_stream_rate_limit_state_carries_across_batches(spark, tmp_path):
    """Online R3 limiter: the admitted-timestamp window persists in
    stream state, so a request in a LATER micro-batch is rejected because
    of admissions in an EARLIER one; after a full window of idleness the
    quota frees up. Stream decisions over ordered arrivals must equal the
    batch stateful_admission of the union."""
    import datetime as dt

    from kg.ops import ratelimit as RL
    from kg.streaming import stream_rate_limit

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def hours(h):
        return t0 + dt.timedelta(hours=h)

    batch1 = [(1, 7, hours(0)), (2, 7, hours(1))]
    batch2 = [
        (3, 7, hours(2)),   # rejected: 2 admitted in window, from batch 1
        (4, 7, hours(30)),  # admitted: batch-1 admissions aged out
        (5, 8, hours(2)),   # admitted: fresh client
    ]
    schema = "event_id long, user_id long, ts timestamp"

    def run_batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(in_dir)
        q = stream_rate_limit(
            spark.readStream.schema(schema).parquet(in_dir), out_dir, ckpt
        )
        q.awaitTermination(120)

    run_batch(batch1)
    run_batch(batch2)
    got = {
        r.event_id: r.admitted
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: True, 5: True}

    # stream == batch operator over the union (arrival order == event order)
    union_dir = str(tmp_path / "union")
    spark.createDataFrame(batch1 + batch2, schema).write.parquet(
        f"{union_dir}/events.parquet"
    )
    want = {
        r.event_id: r.admitted
        for r in RL.stateful_admission(spark, union_dir).collect()
    }
    assert got == want


def test_session_window_batch_equals_lag_sessionize(spark):
    """Three-way pin for the native session_window sessionizer: the batch
    session_window aggregate must equal the hand-built lag-window operator
    (rel_sessionize, which carries the DuckDB oracle) on the shared
    rollup columns. Also proves the >= / > boundary fine print is moot on
    this fixture: no inter-event gap is EXACTLY 30 minutes."""
    from pyspark.sql import Window

    from kg.ops.relational import SESSION_GAP_US, sessionize
    from kg.streaming import sessionize_window_batch

    # boundary precondition: zero exact-gap pairs in the fixture
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    exact_gaps = (
        ev.select((us - F.lag(us).over(w)).alias("gap"))
        .filter(F.col("gap") == SESSION_GAP_US)
        .count()
    )
    assert exact_gaps == 0

    cols = ["user_id", "n_events", "start_ts", "end_ts", "total_value"]
    got = sessionize_window_batch(spark, SF_DIR).select(cols)
    want = sessionize(spark, SF_DIR).select(cols)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_sessionize_merges_across_batches(spark, tmp_path):
    """A session split across two micro-batch file drops must come out of
    the stream as ONE merged row (session_window state carries open
    sessions across batches); once the watermark passes a session's
    close, append mode emits it exactly once, equal to the batch twin."""
    import datetime as dt

    from kg.streaming import _session_window_agg, stream_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    # drop 1: user 1 opens a session (2 events); user 2 a singleton
    drop1 = [
        (1, m(0), 1, "view", 1.0, "{}"),
        (2, m(10), 1, "view", 2.0, "{}"),
        (3, m(0), 2, "buy", 5.0, "{}"),
    ]
    # drop 2: event 4 lands 15 min after event 2 -> MERGES into user 1's
    # open session; event 5 opens a second user-1 session 2 h later; the
    # sentinel (user 99, +10 h) drives the watermark past every close
    drop2 = [
        (4, m(25), 1, "view", 3.0, "{}"),
        (5, m(120), 1, "buy", 7.0, "{}"),
        (6, m(600), 99, "view", 0.0, "{}"),
    ]

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(drop1, schema).write.parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir, ckpt).awaitTermination(120)
    spark.createDataFrame(drop2, schema).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir, ckpt).awaitTermination(120)

    got = {
        (r.user_id, r.n_events, r.start_ts, r.end_ts, r.total_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the split session surfaced as ONE 3-event row spanning both drops
    assert (1, 3, m(0), m(25), 6.0) in got

    # stream == batch session_window of the union, restricted to sessions
    # the watermark finalized (all but the sentinel's own open session)
    union = spark.createDataFrame(drop1 + drop2, schema)
    want = {
        (r.user_id, r.n_events, r.start_ts, r.end_ts, r.total_value)
        for r in _session_window_agg(union).collect()
        if r.user_id != 99
    }
    assert got == want and len(got) == 3
