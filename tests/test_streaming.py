"""Structured Streaming: incremental ingest equals batch; checkpoint resume."""

import shutil

from pyspark.sql import functions as F

from kg.fused import fused_extract_triples
from kg.streaming import stream_extract_triples
from tests.conftest import SF_DIR


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drop half the corpus, stream it
    flat = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    flat.filter(F.col("doc_id") < 250).write.parquet(in_dir)
    q = stream_extract_triples(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)

    got_half = spark.read.parquet(out_dir).count()
    want_half = fused_extract_triples(spark, SF_DIR).filter(
        F.col("doc_id") < "doc-0000250"
    ).count()
    assert got_half == want_half

    # drop the second half into the SAME dir; restart from checkpoint —
    # only the new files are processed (streaming resume)
    flat.filter(F.col("doc_id") >= 250).write.mode("append").parquet(in_dir)
    q2 = stream_extract_triples(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    want = fused_extract_triples(spark, SF_DIR)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    shutil.rmtree(ckpt, ignore_errors=True)


def test_incremental_kg_equals_batch(spark, tmp_path):
    """Full incremental KG construction (extract+link+canonicalize per
    micro-batch via foreachBatch) over two drops equals the batch
    pipeline's edges."""
    from kg.pipeline import run_pipeline
    from kg.streaming import stream_kg_edges

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "edges_stream")
    ckpt = str(tmp_path / "ckpt2")

    flat = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    flat.filter(F.col("doc_id") < 250).write.parquet(in_dir)
    stream_kg_edges(spark, in_dir, out_dir, ckpt).awaitTermination(300)
    flat.filter(F.col("doc_id") >= 250).write.mode("append").parquet(in_dir)
    stream_kg_edges(spark, in_dir, out_dir, ckpt).awaitTermination(300)

    batch_out = str(tmp_path / "batch")
    run_pipeline(spark, SF_DIR, batch_out, extractor="fused")
    got = spark.read.parquet(out_dir)
    want = spark.read.parquet(f"{batch_out}/edges").select(
        "subj_id", "pred", "obj_id", "doc_id", "offset"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
