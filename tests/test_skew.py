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


def test_knn_graph_cap_defuses_hot_bucket(spark, tmp_path):
    """kNN-graph skew drill (round-4 VERDICT item 2): a corpus whose
    vectors ALL land in one sign bucket is the worst case the default
    ``max_bucket`` exists for — uncapped, the hot bucket forms C(n, 2)
    pairs; capped, only the ``max_bucket`` smallest vec_ids survive, so
    per-bucket pair work is bounded independent of the hot bucket's
    size, and the capped result equals the brute-force kNN graph over
    exactly the survivor set (deterministic survivors, not a sample)."""
    import math

    from kg.ops import simsearch

    n, dim, cap = 60, 8, 10
    rows = []
    for i in range(1, n + 1):
        # first SEARCH_SIGN_BITS dims positive => every vector hashes to
        # the all-ones sign bucket; later dims vary so cosines differ
        raw = [1.0 + ((i * (j + 3)) % 7) / 7.0 for j in range(4)] + [
            math.sin(i * (j + 1) * 0.7) for j in range(4, dim)
        ]
        nrm = math.sqrt(sum(x * x for x in raw))
        rows.append((i, [x / nrm for x in raw]))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    uncapped = simsearch.knn_graph(spark, str(tmp_path), max_bucket=None)
    capped = simsearch.knn_graph(spark, str(tmp_path), max_bucket=cap)
    got_unc = uncapped.toPandas()
    got_cap = capped.toPandas()
    # every vector participates uncapped; only the cap survivors capped
    assert set(got_unc["vec_id"]) == set(range(1, n + 1))
    assert set(got_cap["vec_id"]) == set(range(1, cap + 1))
    assert set(got_cap["nbr_id"]) <= set(range(1, cap + 1))
    # capped graph == the uncapped graph of the survivor-only corpus
    spark.createDataFrame(
        rows[:cap], "vec_id long, embedding array<double>"
    ).write.parquet(f"{tmp_path}/survivors/embeddings.parquet")
    want = simsearch.knn_graph(
        spark, f"{tmp_path}/survivors", max_bucket=None
    ).toPandas()
    key = ["vec_id", "nbr_id", "cos", "nn_rank"]
    a = got_cap[key].sort_values(key).reset_index(drop=True)
    b = want[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
