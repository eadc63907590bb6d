"""JSONL source with error budget (SURVEY §2.1 S1)."""

import json

import pytest

from kg.sources import ErrorBudgetExceeded, read_jsonl
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [StructField("id", LongType(), True), StructField("t", StringType(), True)]
)


def _write_jsonl(path, n_good, n_bad):
    with open(path, "w") as f:
        for i in range(n_good):
            f.write(json.dumps({"id": i, "t": f"text {i}"}) + "\n")
        for i in range(n_bad):
            f.write("{this is : not json%d\n" % i)


def test_skips_bad_lines_within_budget(spark, tmp_path):
    p = str(tmp_path / "a.jsonl")
    _write_jsonl(p, 50, 7)
    df = read_jsonl(spark, p, SCHEMA, max_errors=10)
    assert df.count() == 50
    assert set(df.columns) == {"id", "t"}


def test_aborts_past_budget(spark, tmp_path):
    p = str(tmp_path / "b.jsonl")
    _write_jsonl(p, 5, 12)
    with pytest.raises(ErrorBudgetExceeded):
        read_jsonl(spark, p, SCHEMA, max_errors=10)


def test_deferred_budget_is_single_pass(spark, tmp_path):
    """The observe()-based budget piggybacks on the consumer's action:
    check() runs ZERO additional Spark jobs (asserted via job-group job
    counts), and still raises past budget."""
    from kg.sources import read_jsonl_deferred

    p = str(tmp_path / "c.jsonl")
    _write_jsonl(p, 50, 7)
    df, check = read_jsonl_deferred(spark, p, SCHEMA, max_errors=10)
    sc = spark.sparkContext
    sc.setJobGroup("deferred_budget", "consumer action")
    try:
        assert df.count() == 50  # the one and only pass
    finally:
        sc.setJobGroup(None, None)
    jobs_after_action = len(
        sc.statusTracker().getJobIdsForGroup("deferred_budget")
    )
    assert check() == 7  # within budget; returns the observed bad count
    jobs_after_check = len(
        sc.statusTracker().getJobIdsForGroup("deferred_budget")
    )
    assert jobs_after_check == jobs_after_action  # zero extra jobs

    # past budget: the raise comes from the consumer's own action too
    p2 = str(tmp_path / "d.jsonl")
    _write_jsonl(p2, 5, 12)
    df2, check2 = read_jsonl_deferred(spark, p2, SCHEMA, max_errors=10)
    df2.count()
    with pytest.raises(ErrorBudgetExceeded):
        check2()
