"""Cleaning kernel: dirty fixtures through both paths (reference test analog:
``data/scripts/test_pipeline.py:17-43`` — LaTeX content survives, HTML
stripped, no double spaces)."""

import pandas as pd
from pyspark.sql import functions as F

from kg.cleaning import clean_text_col, clean_text_pandas, sql_clean_text

DIRTY = [
    r"\textbf{Table} scan of $n^2$ rows",
    "<b>fast</b> query &amp; merge <i>sort</i>",
    "see https://example.com/x and mail a@b.com now",
    "“curly” ‘quotes’ – dash … end",
    "  doubled   spaces\tand\nnewlines  ",
    r"\alpha \beta $x+y$ $$",
    "plain already clean text",
    "",
]


def _expected():
    return [
        "table scan of n 2 rows",
        'fast query & merge sort',
        "see and mail now",
        "\"curly\" 'quotes' - dash . end",
        "doubled spaces and newlines",
        "x+y",
        "plain already clean text",
        "",
    ]


def test_native_chain(spark):
    df = spark.createDataFrame([(s,) for s in DIRTY], "t string")
    got = [r.c for r in df.select(clean_text_col(F.col("t")).alias("c")).collect()]
    assert got == _expected()


def test_pandas_chain_matches_native(spark):
    got_pd = clean_text_pandas(pd.Series(DIRTY)).tolist()
    assert got_pd == _expected()


def test_sql_chain_matches(duck):
    vals = ", ".join("(" + "'" + s.replace("'", "''") + "'" + ")" for s in DIRTY)
    q = f"SELECT {sql_clean_text('t')} AS c FROM (VALUES {vals}) v(t)"
    got = [r[0] for r in duck.sql(q).fetchall()]
    assert got == _expected()


ACCENTED = [
    "Café crème & naïve façade",         # Latin-1 accents + entity-free &
    "Łukasz vs Ødegaard, smörgåsbord",   # Ł/Ø unmapped (pass through), ö/å fold
    "Ĉu ĝi estas ŝĉo? — ŭōūũ",           # Latin Extended-A
    "&quot;Zoë&quot; &amp; Chloé",       # entities + accents together
    "ÀÉÎÕÜ àéîõü ĀĒĪŌŪ āēīōū",
]


def test_three_way_equality_on_accented_input(spark, duck):
    """Native / pandas / DuckDB cleaning agree on non-ASCII input — the
    round-1 NFKD asymmetry regression test (accents fold via one shared
    fixed translate table in all three paths)."""
    df = spark.createDataFrame([(s,) for s in ACCENTED], "t string")
    native = [
        r.c for r in df.select(clean_text_col(F.col("t")).alias("c")).collect()
    ]
    pandas_ = clean_text_pandas(pd.Series(ACCENTED)).tolist()
    vals = ", ".join("('" + s.replace("'", "''") + "')" for s in ACCENTED)
    q = f"SELECT {sql_clean_text('t')} AS c FROM (VALUES {vals}) v(t)"
    sql = [r[0] for r in duck.sql(q).fetchall()]
    assert native == pandas_ == sql
    # and the fold actually happened (not a vacuous pass-through)
    assert native[0] == 'cafe creme & naive facade'
    assert "ł" in native[1] and "ø" in native[1]  # unmapped chars preserved


def test_dirt_templates_clean_back_to_pristine(spark, duck):
    """Every planted-dirt template (kg.synth) must (a) actually change the
    text and (b) clean back to EXACTLY the pristine chunk through all
    three paths — this is the invariant that lets downstream extraction
    oracles build on the pristine span derivation while Spark runs
    dirty -> clean -> extract."""
    from kg.synth import DIRT_EVERY, N_DIRT_TEMPLATES, plant_dirt_py, sql_dirt

    chunk = "table scan merge part window small"
    cases = []  # one dirty string per template
    s = 1
    while len({(x // DIRT_EVERY) % N_DIRT_TEMPLATES for x, _ in cases}) < N_DIRT_TEMPLATES:
        if s % DIRT_EVERY == 1:
            cases.append((s, plant_dirt_py(s, 0, chunk)))
        s += 1
    assert len(cases) >= N_DIRT_TEMPLATES
    dirty = [d for _, d in cases]
    assert all(d != chunk for d in dirty)
    # pandas path
    assert clean_text_pandas(pd.Series(dirty)).tolist() == [chunk] * len(dirty)
    # native path
    df = spark.createDataFrame([(d,) for d in dirty], "t string")
    got = [r.c for r in df.select(clean_text_col(F.col("t")).alias("c")).collect()]
    assert got == [chunk] * len(dirty)
    # DuckDB path: dirt generated AND cleaned in SQL
    for s, d in cases:
        q = "'" + chunk + "'"
        gen = duck.sql("SELECT " + sql_dirt(q, str(s))).fetchone()[0]
        assert gen == d
        cleaned = duck.sql(
            "SELECT " + sql_clean_text(sql_dirt(q, str(s)))
        ).fetchone()[0]
        assert cleaned == chunk


def test_idempotent_on_clean_corpus(spark):
    """On the synthetic corpus, cleaning must be identity (oracle contract)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    changed = docs.select(
        (clean_text_col(F.col("text")) != F.trim(F.col("text"))).alias("diff")
    ).filter("diff")
    assert changed.count() == 0
