"""Text-analysis operators over the documents table (training-data
pipeline utilities): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Reference analogs: length/content validation (``text_cleaner.py:155-189``),
category histogram + mean-length stats (``data_processor.py:222-230``).
All native expressions (whole-stage codegen); ratios computed on exact
integer counts then rounded, so DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = ["the", "a"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks():
    return F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))


# BPE-ish pre-tokenizer (GPT-2 family): contraction suffixes, then
# optionally-space-prefixed letter / digit / punctuation runs, then
# whitespace runs. RE2-safe (no lookaheads — the original GPT-2
# pattern's trailing-space lookahead is dropped) so the DuckDB oracle
# runs the IDENTICAL pattern; token-list equality across engines is
# pinned in tests on unicode + punctuation samples.
BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_tokens_bpe): whitespace tokens AND BPE-ish
    pre-tokenizer segments (what an LLM data pipeline budgets by — a
    cheap, deterministic stand-in for a real BPE vocab merge count).
    Both native regex/array expressions — whole-stage codegen, no UDF."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(_toks()).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PAT), 0)).alias(
            "n_tokens_bpe"
        ),
    )


def token_count_sql() -> str:
    sql_pat = BPE_PAT.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS int) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{sql_pat}')) AS int) AS n_tokens_bpe
FROM documents"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, stopword_ratio, avg_word_len, quality)

    quality = distinct-token ratio x (1 - stopword_ratio), a cheap proxy
    for repetitive/boilerplate text. All ratios from exact int counts.
    """
    toks = _toks()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("n_chars_tok"),
    )
    return d.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_stop") / F.col("n_tokens"), 4).alias("stopword_ratio"),
        F.round(F.col("n_chars_tok") / F.col("n_tokens"), 4).alias("avg_word_len"),
        F.round(
            (F.col("n_distinct") / F.col("n_tokens"))
            * (1 - F.col("n_stop") / F.col("n_tokens")),
            4,
        ).alias("quality"),
    )


def quality_score_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text,' '), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, w -> w IN ({stops}))) AS n_stop,
         list_sum(list_transform(toks, w -> length(w))) AS n_chars_tok
  FROM d
)
SELECT doc_id,
       CAST(n_tokens AS int) AS n_tokens,
       CAST(n_distinct AS int) AS n_distinct,
       round(n_stop / n_tokens, 4) AS stopword_ratio,
       round(n_chars_tok / n_tokens, 4) AS avg_word_len,
       round((n_distinct / n_tokens) * (1 - n_stop / n_tokens), 4) AS quality
FROM c WHERE n_tokens > 0"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: English function-word ratio >= 2% -> 'en'.
    (n-gram-frequency heuristic slot; real model would be a pandas UDF.)"""
    toks = _toks()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
    )
    return d.select(
        "doc_id",
        F.when(
            (F.col("n_tokens") > 0)
            & (F.col("n_stop") / F.col("n_tokens") >= 0.02),
            F.lit("en"),
        )
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )


def lang_id_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH c AS (
  SELECT doc_id,
         len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tokens,
         len(list_filter(string_split(text,' '), w -> w IN ({stops}))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CASE WHEN n_tokens > 0 AND n_stop / n_tokens >= 0.02
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM c"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token list (reference analog: the dedup hash, D1)."""
    toks = _toks()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fp"),
    )


def fingerprint_sql() -> str:
    return """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           list_filter(string_split(text,' '), x -> x <> ''))), ' ')) AS fp
FROM documents"""
