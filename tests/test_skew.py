"""Skew evidence: a salted join spreads a hot key across tasks where a
plain shuffle join concentrates it on one (the north rule's head-entity
skew defusal, kg.link.salted_join)."""

from pyspark.sql import functions as F

from kg.link import salted_join


def _skewed(spark, n=50_000, hot_frac=0.9):
    return spark.range(n).select(
        F.when(F.col("id") < int(n * hot_frac), F.lit("head-entity"))
        .otherwise(F.concat(F.lit("tail-"), F.col("id")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_balances_hot_key(spark):
    # Reproduce the at-scale regime on toy data: (a) no auto-broadcast —
    # at 100TB neither side fits in memory, the join SHUFFLES, which is
    # when skew bites; (b) no AQE partition coalescing, which would merge
    # this deliberately small shuffle into one partition and mask the
    # per-reducer spread being asserted.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        _run_skew_assertions(spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def _run_skew_assertions(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("head-entity", 1), ("tail-49999", 2)], "k string, grp int"
    )
    n_salts = 8

    # plain shuffle join (broadcast disabled so the skew is visible):
    # every 'head-entity' row lands in ONE shuffle partition
    plain = big.hint("shuffle_hash").join(small.hint("shuffle_hash"), "k")
    plain_sizes = (
        plain.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    plain_max = max(r["count"] for r in plain_sizes)

    salted = salted_join(big, small, "k", n_salts=n_salts, how="inner")
    salted_sizes = (
        salted.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    salted_max = max(r["count"] for r in salted_sizes)

    # identical results...
    assert plain.select("k", "v", "grp").exceptAll(
        salted.select("k", "v", "grp")
    ).count() == 0
    # ...but the hot key's 45k rows spread over n_salts reducers: the
    # biggest post-join partition shrinks by ~n_salts (allow 2x slack for
    # hash imbalance)
    assert salted_max * 2 < plain_max, (plain_max, salted_max)
