"""Structured Streaming surface: incremental document ingest + windowed
event aggregation.

The reference has no stream processing (SURVEY §2.9) — its closest analogs
are the point/batch insert API (``api/main.py:247-325``) and the rolling
latency window (``api/main.py:66-77``). Spark-first upgrades:

* :func:`stream_extract_triples` — file-source ``readStream`` over flat
  document parquet dropped into a directory; the SAME fused Arrow
  extraction kernel runs per micro-batch (mapInPandas is
  streaming-compatible), appending surface triples to a parquet sink with
  a checkpoint — kill/restart resumes from the last committed batch, the
  streaming twin of the batch manifest.
* :func:`windowed_event_counts` — event-time tumbling window with a
  watermark for late data over the events stream (reference's rolling
  mean, done properly with event time instead of arrival order).

Batch semantics equality is tested by feeding the corpus through the
stream (Trigger.AvailableNow) and comparing with the batch extractor.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

FLAT_DOCS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def stream_extract_triples(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Start an availableNow stream: parquet docs dir -> triples parquet.

    Returns the StreamingQuery (caller awaits termination). Restarting
    with the same checkpoint resumes exactly after the last committed
    micro-batch.
    """
    from kg.fused import _run_batches  # late import to keep module light

    src = spark.readStream.schema(FLAT_DOCS).parquet(in_dir)
    from kg.schemas import TRIPLES_SURFACE

    triples = src.mapInPandas(_run_batches, schema=TRIPLES_SURFACE)
    return (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def stream_kg_edges(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Incremental KG construction: the FULL pipeline per micro-batch —
    fused extraction (mapInPandas on the stream) then linking +
    canonicalization + edges append inside ``foreachBatch``.

    The join/canonicalize stages are the same batch plans (broadcast
    dictionary, literal canonical map), so stream output == batch output
    on the same corpus (asserted in tests). Restarting with the same
    checkpoint skips committed micro-batches; the canonical map is
    session-stable (dictionary closure), so late batches canonicalize
    identically — the streaming analog of lineage-pinned resume.
    """
    from kg.canonicalize import canonical_map, canonicalize_triples
    from kg.fused import _run_batches
    from kg.link import alias_dict, link_triples
    from kg.schemas import TRIPLES_SURFACE

    src = spark.readStream.schema(FLAT_DOCS).parquet(in_dir)
    triples = src.mapInPandas(_run_batches, schema=TRIPLES_SURFACE)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        linked = link_triples(batch_df, alias_dict(spark))
        final = canonicalize_triples(linked, canonical_map(spark))
        (
            final.select("subj_id", "pred", "obj_id", "doc_id", "offset")
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        triples.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_dedup_stream(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_ttl_minutes: float | None = None,
):
    """Custom stateful operator: first-wins document dedup ACROSS
    micro-batches (the streaming twin of SURVEY §2.4 D2, whose batch form
    is a window over an explicit order column). Implemented with
    ``applyInPandasWithState``: per ``doc_id`` group, a boolean 'seen'
    state; only the first arrival is emitted, duplicates in later batches
    are dropped. State lives in the checkpoint, so a restarted stream
    still remembers what it emitted.

    ``state_ttl_minutes`` bounds state for CONTINUOUS streams: with a TTL,
    each key's 'seen' marker expires ``state_ttl_minutes`` after its last
    arrival (ProcessingTimeTimeout + ``setTimeoutDuration``; expired keys
    are removed on timeout), so state size tracks the recent-key working
    set instead of growing with every doc_id ever seen. The dedup
    guarantee weakens accordingly — exact within the TTL horizon — which
    is the standard at-scale trade (a 10^12-doc stream cannot keep 10^12
    markers). None (default, right for availableNow backfills) keeps
    exact all-time dedup.
    """
    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "doc_id BIGINT, text STRING"
    state_schema = "seen BOOLEAN"
    ttl_ms = int(state_ttl_minutes * 60_000) if state_ttl_minutes else None

    def _dedup(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame(
                {"doc_id": _pd.Series(dtype="int64"), "text": _pd.Series(dtype="object")}
            )
            return
        batch = _pd.concat(list(pdfs), ignore_index=True)
        fresh = not state.exists
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # refresh on every arrival
        # intra-batch survivor must be deterministic too: micro-batch row
        # order is not — sort on every column before taking the first
        survivor = batch.sort_values(list(batch.columns)).head(1)
        yield survivor if fresh else batch.iloc[0:0]

    deduped = docs_stream.groupBy("doc_id").applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def stream_rate_limit(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Online form of the R3 rate limiter (kg/ops/ratelimit.py — the
    reference's actual deployment: admit/reject requests AS THEY ARRIVE,
    ``api/middleware.py:53-87``). Per-client state = the admitted-
    timestamp window (<= RATE_LIMIT entries), carried across micro-batches
    by ``applyInPandasWithState``; each batch replays the SAME verbatim
    reference algorithm the batch operator uses
    (``ratelimit.simulate_reference``), continuing from the persisted
    window — so stream output over ordered arrivals equals the batch
    ``stateful_admission`` of the union (tested).

    State is exactly-bounded: ProcessingTimeTimeout drops a client's
    state after a FULL window of inactivity — by then every timestamp in
    it would have aged out, so expiry is semantics-free (unlike the dedup
    TTL, which trades exactness for bounded state). Input stream needs
    (event_id, user_id, ts); arrivals are processed in (ts, event_id)
    order within each batch — exactness across batches assumes per-client
    arrival order respects event time, which is inherent to ANY online
    limiter (it cannot reject yesterday's request today).
    """
    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from kg.ops.ratelimit import RATE_WINDOW_S, simulate_reference

    out_schema = "event_id BIGINT, user_id BIGINT, admitted BOOLEAN"
    state_schema = "window ARRAY<BIGINT>"
    window_ms = RATE_WINDOW_S * 1000

    def _limit(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame(
                {
                    "event_id": _pd.Series(dtype="int64"),
                    "user_id": _pd.Series(dtype="int64"),
                    "admitted": _pd.Series(dtype="bool"),
                }
            )
            return
        batch = _pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["tus", "event_id"]
        )
        window = list(state.get[0]) if state.exists else []
        admitted = simulate_reference(
            zip(batch["event_id"], batch["tus"]), window=window
        )
        state.update((window,))
        state.setTimeoutDuration(window_ms)
        yield _pd.DataFrame(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "admitted": admitted,
            }
        )

    decided = (
        events_stream.withColumn(
            "tus", F.unix_micros(F.col("ts").cast("timestamp"))
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _limit,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    return (
        decided.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """10-minute tumbling event-time windows with a 20-minute watermark:
    (window, event_type, n, total_value). Late events beyond the watermark
    are dropped — the at-scale answer to unbounded state."""
    return (
        events_stream.withWatermark("ts", "20 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def windowed_event_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming aggregation (same plan minus watermark)
    — this is what the driver's DuckDB oracle checks."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def windowed_event_counts_sql() -> str:
    return """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS win_end,
       event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS decimal(18,4))) AS double), 4) AS total_value
FROM events
GROUP BY 1, 2, 3"""


# ---------------------------------------------------------------------------
# Round-5 session 2: event-time sessionization on the stream via Spark's
# NATIVE session_window — the stateful merge-on-overlap operator the
# batch twin (kg/ops/relational.py::sessionize) hand-builds with a lag
# window. Watermark bounds per-user state exactly like the tumbling agg.
# ---------------------------------------------------------------------------


def _session_window_agg(ev: DataFrame) -> DataFrame:
    """Shared session aggregate: per (user, 30-min-gap session) —
    (user_id, n_events, start_ts, end_ts, total_value). Bounds come from
    min/max(ts), NOT the session_window struct (whose end is last-event +
    gap), so rows are comparable with the batch lag-window operator.

    Boundary fine print: session_window opens a NEW session when the
    inter-event gap is >= the 30-min threshold (merge needs strict
    overlap), the lag-window twin when it is > the threshold. The two
    differ only on exact-equality gaps — measure-zero with microsecond
    event time, and absent from the fixture (asserted by the three-way
    equality test)."""
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("win"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("total_value"),
        )
        .select("user_id", "n_events", "start_ts", "end_ts", "total_value")
    )


def stream_sessionize(
    spark: SparkSession, in_dir: str, out_dir: str, ckpt: str
):
    """Sessionize an events stream: native session_window state merges
    sessions across micro-batches (a session split across two file drops
    comes out as ONE row); the 60-min watermark finalizes a session once
    event time moves past its close, bounding state. Append mode emits
    each session exactly once."""
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    src = spark.readStream.schema(schema).parquet(in_dir)
    # event-time watermarks require TIMESTAMP (not NTZ); session TZ is
    # pinned UTC, so the cast relabels the same instant bit-for-bit
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = _session_window_agg(src.withWatermark("ts", "60 minutes"))
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def sessionize_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: the same native session_window aggregate over the
    events table (session_window works in batch too)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _session_window_agg(ev)


def sessionize_native_sql() -> str:
    """DuckDB oracle for the native session_window twin: the lag-window
    sessionize oracle (whose > vs >= boundary difference is moot on the
    fixture — asserted in tests) projected to the shared rollup columns,
    with the twin's round-to-4 on the value sum."""
    from kg.ops.relational import sessionize_sql

    return f"""
SELECT user_id, n_events, start_ts, end_ts,
       round(total_value, 4) AS total_value
FROM ({sessionize_sql()})"""


def sliding_event_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (width 10 min, slide 5 min — every
    event lands in exactly TWO overlapping windows), the windowing shape
    the tumbling twin (:func:`windowed_event_counts_batch`) does not
    cover: (win_start, win_end, event_type, n, total_value). Native
    ``F.window(ts, width, slide)`` — in a stream the same aggregate runs
    under a watermark exactly like the tumbling form (Spark expands each
    row to its covering windows before the keyed aggregate; state is one
    row per open (window, type) pair).

    Scale shape: one keyed exchange after a 2x row expansion — identical
    plan family to the tumbling agg. The oracle re-derives window
    membership with exact int64 epoch-microsecond floor division, so
    engine agreement is integer-exact."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_event_counts_sql() -> str:
    # width 600e6 us, slide 300e6 us; Spark aligns window starts to the
    # epoch, so starts covering ts are (floor(us/slide)-1)*slide and
    # floor(us/slide)*slide, filtered to us < start + width
    width, slide = 600_000_000, 300_000_000
    return f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, event_type, value FROM events
),
cand AS (
  SELECT us, event_type, value,
         unnest([((us // {slide}) - 1) * {slide},
                 (us // {slide}) * {slide}]) AS ws
  FROM e
)
SELECT make_timestamp(ws) AS win_start,
       make_timestamp(ws + {width}) AS win_end,
       event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS decimal(18,4))) AS double), 4)
         AS total_value
FROM cand WHERE us >= ws AND us < ws + {width}
GROUP BY 1, 2, 3"""
