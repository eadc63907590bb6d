"""Fused Arrow kernel: exact equality with the stagewise paths + oracle."""

from kg.fused import fused_extract_triples
from kg.oracles import triples_surface_sql
from kg.queries import q_triples_surface
from tests.conftest import SF_DIR, assert_df_equal


def test_fused_equals_stagewise(spark):
    a = fused_extract_triples(spark, SF_DIR)
    b = q_triples_surface(spark, SF_DIR)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fused_matches_duckdb(spark, duck):
    assert_df_equal(fused_extract_triples(spark, SF_DIR), duck.sql(triples_surface_sql()))


def test_fused_pipeline_resume_and_nodes(spark, tmp_path):
    """Fused e2e writes the same edges as the sql-extractor e2e, and the
    edges-derived nodes build equals the surface-derived one."""
    from kg.pipeline import run_pipeline

    out_a = str(tmp_path / "fused")
    out_b = str(tmp_path / "sql")
    run_pipeline(spark, SF_DIR, out_a, extractor="fused")
    run_pipeline(spark, SF_DIR, out_b, extractor="sql")
    for table in ("edges", "nodes"):
        a = spark.read.parquet(f"{out_a}/{table}")
        b = spark.read.parquet(f"{out_b}/{table}")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, table


def test_kernel_side_tiling_equals_crossjoin_tiling(spark):
    """r06: replicate tiling moved inside the kernel (one text transfer
    instead of `replicate` identical copies across the Python boundary);
    the row multiset must equal the JVM crossJoin tiling it replaced."""
    from pyspark.sql import functions as F

    from kg.fused import _run_batches, fused_extract_triples
    from kg.schemas import TRIPLES_SURFACE
    from kg.synth import REPLICA_STRIDE
    from tests.conftest import SF_DIR

    new = fused_extract_triples(spark, SF_DIR, replicate=3)
    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .repartition(4)
    )
    reps = spark.range(3).select(F.col("id").alias("_rep"))
    flat = base.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("_rep") * REPLICA_STRIDE).alias("doc_id"),
        "text",
    )
    ref = flat.mapInPandas(_run_batches, schema=TRIPLES_SURFACE)
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0
