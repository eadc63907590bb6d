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
