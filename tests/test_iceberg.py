"""Iceberg probe + routing (SURVEY §7.4.7): this container has no
iceberg-spark-runtime jar, so the probe must report unavailable and every
writer must fall back to the parquet layout. If a jar ever appears (e.g.
on a real cluster), the same test exercises the REAL Iceberg write."""

from pyspark.sql import functions as F

from kg.iceberg import (
    find_iceberg_jar,
    iceberg_enabled,
    probe_report,
    write_edges_iceberg,
)


def test_probe_is_consistent(spark):
    jar = find_iceberg_jar()
    rep = probe_report()
    assert rep["available"] == (jar is not None)
    # a session built without the jar must not claim the catalog works
    if jar is None:
        assert not iceberg_enabled(spark)
        assert rep["fallback"] is not None


def test_write_routes_by_probe(spark, tmp_path):
    edges = spark.range(100).select(
        F.col("id").alias("subj_id"),
        F.lit("p").alias("pred"),
        (F.col("id") + 1).alias("obj_id"),
    )
    if iceberg_enabled(spark):
        full = write_edges_iceberg(spark, edges, table="t_edges", n_buckets=4)
        assert spark.read.table(full).count() == 100
    else:
        # fallback path: the parquet bucketBy catalog table still works
        from kg.materialize import write_bucketed_table

        t = write_bucketed_table(spark, edges, table="t_ice_fallback", n_buckets=4)
        assert spark.read.table(t).count() == 100
        spark.sql(f"DROP TABLE IF EXISTS {t}")
