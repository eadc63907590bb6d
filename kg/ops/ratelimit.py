"""R3 — sliding-window rate limiting, re-expressed for a data engine
(reference: ``api/middleware.py:11-87`` — per-client sliding window,
100 req/min, admitted requests only consume quota, checked under an
async lock).

An HTTP middleware has no literal Spark counterpart, but its SEMANTICS
do, in the two forms a data platform actually needs them:

* :func:`sliding_admission` — admission audit over a request log
  (events table: user_id = client, ts = request time): per request, the
  count of requests from the same client inside the trailing window and
  the would-be admission verdict, as ONE range-frame window function —
  SQL-expressible, so this form is DuckDB-oracle-exact
  (``rl_sliding_admission``). This is the batch/offline form: abuse
  audits, quota reports, replaying yesterday's log against a proposed
  limit. Count-all semantics (every request occupies the window).

* :func:`stateful_admission` — the reference's EXACT semantics, which
  are inherently sequential per client (a rejected request is NOT
  appended to the window, so later requests see only admitted ones —
  ``middleware.py:29-44``). Sequential-per-key + independent-across-keys
  is the ``applyInPandas`` shape (same as sessionization): one shuffle
  on the client key, per-client state bounded at ``RATE_LIMIT``
  timestamps. Equality is pinned two ways: against a verbatim
  driver-side simulation of the reference algorithm
  (tests/test_ratelimit.py), and by a full DuckDB oracle
  (:func:`stateful_admission_sql`) that replays the sequential loop as a
  RECURSIVE CTE carrying the admitted-timestamp window as a list-typed
  state column — exact because the state is pure integers
  (microseconds), no float accumulation anywhere. The same kernel body
  drops into ``applyInPandasWithState`` for the online/streaming form
  (state = the admitted-timestamp deque per client — kg/streaming.py
  ``stream_rate_limit``).

Dials are module constants so the oracle SQL and both operators stay in
lockstep; sized for the sandbox events density (15 clients, ~2.2
requests/client/day) so BOTH verdicts occur at every SF — the reference
dial (100/min) would admit everything here.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RATE_LIMIT = 2  # admitted budget per client per window
RATE_WINDOW_S = 86_400  # sliding window length (seconds)
_WINDOW_US = RATE_WINDOW_S * 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )


def sliding_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-all sliding-window admission audit: (event_id, user_id,
    n_in_window, admitted). The window is the half-open interval
    ``(t - RATE_WINDOW_S, t]`` — strict at the old edge, matching the
    reference's ``current_time - req_time < window_size`` retention.

    Plan shape: one shuffle on the client key, then a single range-frame
    window over epoch microseconds (numeric RANGE frames are exact and
    engine-portable; interval frames are not available to Spark's
    rangeBetween). No joins, no self-join blowup — at 10^12 requests the
    cost is one sort per client partition."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-(_WINDOW_US - 1), 0)
    )
    n = F.count("*").over(w)
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        n.alias("n_in_window"),
        (n <= RATE_LIMIT).alias("admitted"),
    )


def sliding_admission_sql() -> str:
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
)
SELECT event_id, user_id,
       count(*) OVER w AS n_in_window,
       (count(*) OVER w) <= {RATE_LIMIT} AS admitted
FROM e
WINDOW w AS (
  PARTITION BY user_id ORDER BY tus
  RANGE BETWEEN {_WINDOW_US - 1} PRECEDING AND CURRENT ROW
)"""


def simulate_reference(
    rows: Iterable[tuple[int, int]], limit: int = RATE_LIMIT,
    window_us: int = _WINDOW_US, window: list[int] | None = None,
) -> list[bool]:
    """Verbatim port of the reference sliding-window algorithm
    (``middleware.py:20-44``) over one client's (event_id, ts_us) rows in
    arrival order: evict admitted timestamps older than the window, check
    the limit, and append ONLY if admitted. Used by the distributed batch
    kernel (per client group), the streaming state kernel
    (kg/streaming.py — pass ``window`` to carry state across
    micro-batches; the list is mutated in place and holds the final
    admitted window on return), and the test's global simulation."""
    if window is None:
        window = []
    out: list[bool] = []
    for _eid, t in rows:
        window[:] = [wt for wt in window if t - wt < window_us]
        if len(window) >= limit:
            out.append(False)
        else:
            window.append(t)
            out.append(True)
    return out


def stateful_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact admission decisions: (event_id, user_id, admitted),
    admitted-only-consume-quota. Each client's log is replayed in
    (ts, event_id) order by an Arrow-batched kernel; clients are
    independent, so the work distributes across the cluster with ONE
    shuffle on the client key and O(RATE_LIMIT) state per client."""

    def _one_client(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tus", "event_id"]).reset_index(drop=True)
        pdf["admitted"] = simulate_reference(
            zip(pdf["event_id"], pdf["tus"])
        )
        return pdf[["event_id", "user_id", "admitted"]]

    return (
        _events(spark, sf_dir)
        .withColumn("tus", F.unix_micros(F.col("ts").cast("timestamp")))
        .groupBy("user_id")
        .applyInPandas(
            _one_client, "event_id long, user_id long, admitted boolean"
        )
    )


def stateful_admission_sql() -> str:
    """DuckDB oracle for :func:`stateful_admission`: the per-client
    sequential loop as a RECURSIVE CTE. Each client's requests are
    numbered in (ts, event_id) order; step i -> i+1 carries the admitted-
    timestamp window as a LIST state column and replays the reference
    algorithm verbatim — evict entries aged >= the window
    (``t - wt < window`` retention), admit iff fewer than RATE_LIMIT
    remain, append only if admitted. All state is integer microseconds,
    so the replay is exact (no float accumulation). The recursion depth
    is the longest per-client log; each iteration is one indexed join —
    fine for an oracle (the distributed operator stays the scale path)."""
    evict = f"list_filter(r.w, wt -> e.tus - wt < {_WINDOW_US})"
    return f"""
WITH RECURSIVE e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS i
  FROM events
),
r(user_id, i, event_id, admitted, w) AS (
  SELECT user_id, i, event_id, TRUE, [tus]
  FROM e WHERE i = 1
  UNION ALL
  SELECT e.user_id, e.i, e.event_id,
         len({evict}) < {RATE_LIMIT},
         CASE WHEN len({evict}) < {RATE_LIMIT}
              THEN list_append({evict}, e.tus)
              ELSE {evict} END
  FROM r JOIN e ON e.user_id = r.user_id AND e.i = r.i + 1
)
SELECT event_id, user_id, admitted FROM r"""
