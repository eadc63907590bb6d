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


def test_dirty_corpus_raw_differs_from_normalized(spark):
    """The planted dirt makes stage 0 a REAL transformation on the driver
    corpus (round-3 VERDICT item 2): raw != normalized on ~1/3 of text
    spans, and every dirt template class occurs corpus-wide."""
    from kg.normalize import normalize_spans
    from kg.synth import DIRT_EVERY

    docs = load_interleaved(spark, SF_DIR)
    raw = explode_spans(docs).filter(F.col("kind") == "text")
    norm = normalize_spans(docs).filter(F.col("kind") == "text")
    joined = raw.alias("r").join(
        norm.alias("n"), ["doc_id", "offset"]
    ).select(
        F.col("r.text").alias("rt"), F.col("n.text").alias("nt"), "doc_id", "offset"
    )
    n_text = joined.count()
    n_diff = joined.filter(F.col("rt") != F.col("nt")).count()
    assert n_diff > 0
    # every dirty span must differ (each template changes the text), and
    # only dirty spans may differ
    expected_dirty = raw.filter(
        (F.col("doc_id").substr(5, 7).cast("long") + F.col("offset")) % DIRT_EVERY == 1
    ).count()
    assert n_diff == expected_dirty
    assert 0.2 < n_diff / n_text < 0.5
    # all 6 template signatures present in the raw corpus
    for marker in (
        '<p class="x">', "\\textbf{", "http://spam.example.com",
        "spam.bot@example.com", "&nbsp;", " $$",
    ):
        assert raw.filter(F.col("text").contains(marker)).count() > 0, marker


def test_normalized_spans_match_pristine_duckdb(spark, duck):
    """clean(dirty) == pristine chunk corpus-wide: Spark's normalized
    spans equal the NO-DIRT DuckDB derivation — the invariant that lets
    downstream oracles build on SQL_EXPLODED_SPANS_CLEAN."""
    from kg.normalize import normalize_spans
    from kg.synth import SQL_EXPLODED_SPANS_CLEAN

    docs = load_interleaved(spark, SF_DIR)
    assert_df_equal(normalize_spans(docs), duck.sql(SQL_EXPLODED_SPANS_CLEAN))
