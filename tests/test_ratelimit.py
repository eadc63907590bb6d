"""R3 rate-limiter analog (kg/ops/ratelimit.py): the audit form against
its DuckDB oracle, the stateful form against a verbatim simulation of the
reference algorithm (api/middleware.py:20-44), and the semantic
relationships between the two."""

from collections import defaultdict

from pyspark.sql import functions as F

from kg.ops import ratelimit as RL
from tests.conftest import SF_DIR, assert_df_equal


def _duck_with_events(duck):
    try:
        duck.sql(
            f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
        )
    except Exception:
        pass  # already registered
    return duck


def test_sliding_admission_matches_oracle(spark, duck):
    assert_df_equal(
        RL.sliding_admission(spark, SF_DIR),
        _duck_with_events(duck).sql(RL.sliding_admission_sql()),
    )


def test_both_verdicts_occur(spark):
    """The dials must actually bite on the sandbox corpus — a limiter that
    admits (or rejects) everything tests nothing."""
    counts = dict(
        RL.sliding_admission(spark, SF_DIR)
        .groupBy("admitted").count().collect()
    )
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0, counts


def test_stateful_matches_reference_simulation(spark):
    """Distributed applyInPandas result == driver-side replay of the
    reference's exact algorithm over every client's log."""
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"))
        .collect()
    )
    by_client = defaultdict(list)
    for r in sorted(events, key=lambda r: (r.tus, r.event_id)):
        by_client[r.user_id].append((r.event_id, r.tus))
    expected = {}
    for uid, rows in by_client.items():
        for (eid, _), adm in zip(rows, RL.simulate_reference(rows)):
            expected[eid] = adm
    got = {
        r.event_id: r.admitted
        for r in RL.stateful_admission(spark, SF_DIR).collect()
    }
    assert got == expected


def test_stateful_admits_superset_of_sliding(spark):
    """Count-all admission implies stateful admission: the stateful
    window holds only admitted requests, a subset of all requests, so
    its count can never exceed the count-all window's. (The converse is
    false — rejected requests not consuming quota is exactly what the
    reference semantics add.)"""
    sliding = {
        r.event_id: r.admitted
        for r in RL.sliding_admission(spark, SF_DIR).collect()
    }
    stateful = {
        r.event_id: r.admitted
        for r in RL.stateful_admission(spark, SF_DIR).collect()
    }
    assert set(sliding) == set(stateful)
    for eid, adm in sliding.items():
        if adm:
            assert stateful[eid], eid
    # and the gap is real on this corpus (stateful strictly admits more)
    assert sum(stateful.values()) > sum(sliding.values())


def test_no_window_ever_exceeds_limit(spark):
    """Hard invariant of the stateful limiter: for ANY client and ANY
    point in time, the number of ADMITTED requests inside the trailing
    window is <= RATE_LIMIT."""
    rows = (
        RL.stateful_admission(spark, SF_DIR)
        .filter("admitted")
        .join(
            spark.read.parquet(f"{SF_DIR}/events.parquet").select(
                "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")
            ),
            "event_id",
        )
        .collect()
    )
    by_client = defaultdict(list)
    for r in rows:
        by_client[r.user_id].append(r.tus)
    win = RL.RATE_WINDOW_S * 1_000_000
    for uid, ts in by_client.items():
        ts.sort()
        for i, t in enumerate(ts):
            in_window = [x for x in ts[: i + 1] if t - x < win]
            assert len(in_window) <= RL.RATE_LIMIT, (uid, t)


def test_stateful_admission_oracle_exact(spark, duck):
    """The recursive-CTE oracle replays the sequential admitted-only-
    consume-quota loop exactly (integer-microsecond state, no float
    accumulation), so the stateful operator is value-oracle-checked like
    every other deterministic contract query — not just simulation-pinned."""
    from tests.conftest import assert_df_equal

    assert_df_equal(
        RL.stateful_admission(spark, SF_DIR),
        duck.sql(RL.stateful_admission_sql()),
    )
