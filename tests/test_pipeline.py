"""End-to-end: P/R gate vs oracle, span-sequence invariant, resume-after-kill."""

import pytest
from pyspark.sql import functions as F

from kg.materialize import InjectedFailure
from kg.normalize import normalize_spans, reassemble_spans
from kg.oracles import edges_sql
from kg.pipeline import run_pipeline
from kg.synth import load_interleaved
from tests.conftest import SF_DIR


def _edge_multiset(pdf):
    from collections import Counter

    return Counter(map(tuple, pdf.to_numpy().tolist()))


def test_precision_recall_vs_oracle(spark, duck, tmp_path):
    out = str(tmp_path / "kg_out")
    run_pipeline(spark, SF_DIR, out, extractor="sql")
    got = _edge_multiset(
        spark.read.parquet(f"{out}/edges")
        .select("subj_id", "pred", "obj_id", "doc_id", "offset")
        .toPandas()
    )
    want = _edge_multiset(duck.sql(edges_sql()).df())
    tp = sum((got & want).values())
    precision = tp / sum(got.values())
    recall = tp / sum(want.values())
    # north rule: P/R >= 0.95; deterministic semantics give exactly 1.0
    assert precision == 1.0 and recall == 1.0, (precision, recall)


def test_span_sequence_invariant(spark):
    """(kind, text, media_ref, order) per doc survives explode+normalize:
    the round trip equals the input with text spans CLEANED in place (the
    corpus carries planted dirt since round 4, so cleaning is no longer an
    identity — kind/media_ref/order must still be untouched)."""
    from kg.cleaning import clean_text_col

    docs = load_interleaved(spark, SF_DIR)
    expected = docs.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(s["kind"] == "text", clean_text_col(s["text"]))
                .otherwise(s["text"])
                .alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    round_trip = reassemble_spans(normalize_spans(docs))
    diff = expected.join(round_trip.withColumnRenamed("spans", "spans2"), "doc_id")
    bad = diff.filter(F.col("spans") != F.col("spans2"))
    assert bad.count() == 0
    assert round_trip.count() == docs.count()


def test_resume_after_kill_produces_identical_output(spark, tmp_path):
    out_killed = str(tmp_path / "killed")
    out_fresh = str(tmp_path / "fresh")
    with pytest.raises(InjectedFailure):
        run_pipeline(spark, SF_DIR, out_killed, fail_after_groups=2)
    # partial state: some groups committed, not all
    import duckdb

    n_committed = duckdb.sql(
        f"select count(*) from parquet_scan('{out_killed}/_manifest/*.parquet') "
        "where stage='materialize_edges'"
    ).fetchone()[0]
    assert n_committed == 2
    # resume
    stats = run_pipeline(spark, SF_DIR, out_killed)
    assert stats["edges_written_this_run"] > 0
    run_pipeline(spark, SF_DIR, out_fresh)
    a = (
        spark.read.parquet(f"{out_killed}/edges")
        .select("subj_id", "pred", "obj_id", "doc_id", "offset")
    )
    b = (
        spark.read.parquet(f"{out_fresh}/edges")
        .select("subj_id", "pred", "obj_id", "doc_id", "offset")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # second rerun is a no-op
    stats2 = run_pipeline(spark, SF_DIR, out_killed)
    assert stats2["edges_written_this_run"] == 0


def test_resume_with_changed_n_groups_is_safe(spark, tmp_path):
    """ADVICE round 1: group id g means 'group_col % n_groups == g', so a
    resume under a DIFFERENT modulus must not reuse commits (silent data
    loss) nor double-read stale part_group dirs. n_groups is part of the
    lineage and uncommitted-under-this-lineage dirs are swept, so a
    modulus change degrades to a clean full rewrite."""
    out = str(tmp_path / "modchange")
    out_ref = str(tmp_path / "ref")
    with pytest.raises(InjectedFailure):
        run_pipeline(spark, SF_DIR, out, n_groups=8, fail_after_groups=3)
    # resume with a SMALLER modulus: old groups 0-2 (mod 8) must not be
    # trusted as groups 0-2 (mod 4)
    stats = run_pipeline(spark, SF_DIR, out, n_groups=4)
    assert stats["edges_written_this_run"] > 0
    run_pipeline(spark, SF_DIR, out_ref, n_groups=4)
    a = spark.read.parquet(f"{out}/edges").select(
        "subj_id", "pred", "obj_id", "doc_id", "offset"
    )
    b = spark.read.parquet(f"{out_ref}/edges").select(
        "subj_id", "pred", "obj_id", "doc_id", "offset"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
