"""Interleaved-spans derivation invariants + DuckDB parity (FIXTURES.md §1/§6)."""

from pyspark.sql import functions as F

from kg.normalize import explode_spans
from kg.oracles import spans_sql
from kg.synth import load_interleaved
from tests.conftest import SF_DIR, assert_df_equal


def test_span_invariants(spark):
    docs = load_interleaved(spark, SF_DIR)
    flat = explode_spans(docs)
    bad_kind = flat.filter(~F.col("kind").isin("text", "image", "audio", "video"))
    assert bad_kind.count() == 0
    # exactly one of text/media_ref populated
    bad_pop = flat.filter(
        ((F.col("kind") == "text") & ((F.col("text") == "") | (F.col("media_ref") != "")))
        | ((F.col("kind") != "text") & ((F.col("text") != "") | (F.col("media_ref") == "")))
    )
    assert bad_pop.count() == 0
    # offsets dense per doc: max(offset) == count-1, min == 0
    agg = flat.groupBy("doc_id").agg(
        F.min("offset").alias("mn"),
        F.max("offset").alias("mx"),
        F.count("*").alias("n"),
    )
    assert agg.filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count() == 0


def test_spans_match_duckdb(spark, duck):
    docs = load_interleaved(spark, SF_DIR)
    assert_df_equal(explode_spans(docs), duck.sql(spans_sql()))
