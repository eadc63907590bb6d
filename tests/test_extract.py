"""Extraction semantics: hand cases + HOF/pandas parity + DuckDB parity."""

from pyspark.sql import functions as F

from kg.extract import extract_triples, extract_triples_pandas
from kg.normalize import normalize_spans
from kg.oracles import triples_surface_sql
from kg.schemas import DOCUMENTS
from kg.synth import load_interleaved
from tests.conftest import SF_DIR, assert_df_equal


def _mk_docs(spark, spans_by_doc):
    rows = [
        (doc, [(k, t, m, o) for (k, t, m, o) in spans])
        for doc, spans in spans_by_doc.items()
    ]
    return spark.createDataFrame(rows, DOCUMENTS)


def _triples(spark, spans_by_doc, fn=extract_triples):
    docs = _mk_docs(spark, spans_by_doc)
    out = fn(normalize_spans(docs))
    return {
        (r.doc_id, r.offset, r.subj_surface, r.pred, r.obj_surface, r.subj_pos, r.obj_pos)
        for r in out.collect()
    }


def test_adjacent_mentions_with_predicate(spark):
    got = _triples(spark, {"d1": [("text", "table scan row", "", 0)]})
    assert got == {("d1", 0, "table", "scan", "row", 0, 2)}


def test_adjacent_mentions_without_predicate(spark):
    got = _triples(spark, {"d1": [("text", "table big row", "", 0)]})
    assert got == {("d1", 0, "table", "near", "row", 0, 2)}


def test_first_predicate_wins(spark):
    got = _triples(spark, {"d1": [("text", "key sort merge value", "", 0)]})
    assert got == {("d1", 0, "key", "sort", "value", 0, 3)}


def test_consecutive_pairs_chain(spark):
    got = _triples(spark, {"d1": [("text", "key value query", "", 0)]})
    assert got == {
        ("d1", 0, "key", "near", "value", 0, 1),
        ("d1", 0, "value", "near", "query", 1, 2),
    }


def test_no_or_single_mention_yields_nothing(spark):
    got = _triples(
        spark,
        {
            "d1": [("text", "the fast slow big", "", 0)],
            "d2": [("text", "table the fast", "", 1)],
            "d3": [("text", "", "", 0)],
        },
    )
    assert got == set()


def test_media_span_triple(spark):
    got = _triples(spark, {"d9": [("image", "", "media://image/9-0", 3)]})
    assert got == {("d9", 3, "d9", "has_image", "media://image/9-0", -1, -1)}


def test_pandas_extractor_equals_hof(spark):
    docs = load_interleaved(spark, SF_DIR)
    spans = normalize_spans(docs)
    a = extract_triples(spans)
    b = extract_triples_pandas(spans)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_matches_duckdb_oracle(spark, duck):
    docs = load_interleaved(spark, SF_DIR)
    assert_df_equal(extract_triples(normalize_spans(docs)), duck.sql(triples_surface_sql()))
