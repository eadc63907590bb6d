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


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
    published repetition filters LLM data pipelines gate on):
    (doc_id, n_bigrams, dup_bigram_frac, dup_trigram_frac,
    top_bigram_frac, repetitive).

    * ``dup_{bi,tri}gram_frac``: fraction of n-gram slots occupied by a
      repeated n-gram — computed PER ROW from exact integer counts
      (``size - size(array_distinct)``), whole-stage codegen, no shuffle.
    * ``top_bigram_frac``: share of the most frequent bigram. The mode
      needs a per-(doc, bigram) histogram; a per-row O(n²)
      filter-per-distinct would melt on 10k-token documents, so it runs
      as explode → two-level groupBy — partial aggregation combines
      map-side and the shuffle key (doc_id) is the document, so the
      stage scales with corpus size, never with a hot n-gram.
    * ``repetitive``: top_bigram_frac > 0.18 (Gopher's top-2-gram gate)
      OR dup_trigram_frac > 0.30.

    Documents with fewer than two tokens carry no bigram signal and are
    excluded (same guard as quality_score's n_tokens > 0)."""
    toks = _toks()

    def grams(n: int):
        # positions 0 .. size-n; guarded because sequence(0, negative)
        # generates a DESCENDING sequence instead of an empty one
        idx = F.sequence(F.lit(0), F.size("toks") - n)
        return F.when(
            F.size("toks") >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.col("toks")[i + j] for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = (
        _docs(spark, sf_dir)
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", grams(2).alias("bg"), grams(3).alias("tg"))
        .select(
            "doc_id",
            "bg",
            F.size("bg").alias("n_bg"),
            F.size(F.array_distinct("bg")).alias("n_bg_d"),
            F.size("tg").alias("n_tg"),
            F.size(F.array_distinct("tg")).alias("n_tg_d"),
        )
        .filter(F.col("n_bg") > 0)
    )
    tops = (
        base.select("doc_id", F.explode("bg").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_n"))
    )
    out = base.join(tops, "doc_id").select(
        "doc_id",
        F.col("n_bg").alias("n_bigrams"),
        F.round((F.col("n_bg") - F.col("n_bg_d")) / F.col("n_bg"), 4).alias(
            "dup_bigram_frac"
        ),
        F.when(
            F.col("n_tg") > 0,
            F.round((F.col("n_tg") - F.col("n_tg_d")) / F.col("n_tg"), 4),
        ).alias("dup_trigram_frac"),
        F.round(F.col("top_n") / F.col("n_bg"), 4).alias("top_bigram_frac"),
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_bigram_frac") > 0.18)
        | (F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)) > 0.30),
    )


def repetition_sql() -> str:
    return """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bg,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS tg
  FROM d
),
base AS (
  SELECT doc_id, bg,
         len(bg) AS n_bg, len(list_distinct(bg)) AS n_bg_d,
         len(tg) AS n_tg, len(list_distinct(tg)) AS n_tg_d
  FROM g WHERE len(bg) > 0
),
tops AS (
  SELECT doc_id, max(cnt) AS top_n FROM (
    SELECT doc_id, bigram, count(*) AS cnt
    FROM (SELECT doc_id, unnest(bg) AS bigram FROM base)
    GROUP BY doc_id, bigram
  ) GROUP BY doc_id
),
out AS (
  SELECT base.doc_id,
         CAST(n_bg AS int) AS n_bigrams,
         round((n_bg - n_bg_d) / n_bg, 4) AS dup_bigram_frac,
         CASE WHEN n_tg > 0 THEN round((n_tg - n_tg_d) / n_tg, 4) END AS dup_trigram_frac,
         round(top_n / n_bg, 4) AS top_bigram_frac
  FROM base JOIN tops ON base.doc_id = tops.doc_id
)
SELECT *,
       (top_bigram_frac > 0.18 OR coalesce(dup_trigram_frac, 0.0) > 0.30) AS repetitive
FROM out"""


TFIDF_TOP_K = 3


def tfidf_topterms(
    spark: SparkSession, sf_dir: str, k: int = TFIDF_TOP_K
) -> DataFrame:
    """Per-document top-k TF-IDF terms — (doc_id, term_rank, term, tf,
    df, tfidf): the classic keyword-extraction / relevance-weighting op
    a search or training-data pipeline runs over every corpus.

    tfidf = tf * ln((N+1)/(df+1)) (add-one smoothed idf), rounded to 6
    decimals BEFORE ranking so Spark and DuckDB rank the identical
    numbers; residual libm-ln last-ulp variance is the same accepted
    class as the existing round()ed divisions. Ties break on the term
    string, so the per-doc top-k set is fully deterministic.

    Scale shape: three shuffles, all key-bounded — tf on (doc_id, term),
    document frequency on term (count-only, map-side partials, so a
    stopword term is one partial per partition, never a hot reduce key),
    and the per-doc top-k window on doc_id (document-bounded partitions,
    never a global sort). The tf⟕df join is term-keyed; AQE's skew-join
    handles the stopword fan-out at 100 TB."""
    n_docs = _docs(spark, sf_dir).count()
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(_toks()).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
            6,
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term_rank", "term", "tf", "df", "tfidf")
    )


def tfidf_topterms_sql(k: int = TFIDF_TOP_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(tf.tf * ln((nd.n + 1.0) / (dfreq.df + 1)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS term_rank
  FROM scored
)
SELECT doc_id, term_rank, term, tf, df, tfidf
FROM ranked WHERE term_rank <= {k}"""


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


MG_PHI_DEN = 100  # heavy-hitter threshold: exact count >= ceil(N/100)
MG_CAPACITY = 256  # per-partition Misra-Gries counters (must be > phi_den)


def _mg_sweep(capacity: int):
    """Per-partition Misra-Gries summary over a (term) stream: classic
    decrement-all-on-overflow, carried ACROSS Arrow batches within the
    partition (mapInPandas yields once per partition). Emits the
    surviving counter keys — a guaranteed superset of every term with
    partition count > n_p/(capacity+1)."""
    import pandas as _pd

    def run(batches):
        counters: dict = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
        yield _pd.DataFrame({"term": _pd.Series(list(counters), dtype="object")})

    return run


def frequent_terms(
    spark: SparkSession,
    sf_dir: str,
    phi_den: int = MG_PHI_DEN,
    capacity: int = MG_CAPACITY,
) -> DataFrame:
    """Corpus-frequent terms — (term, n) for every whitespace token with
    exact count >= ceil(N/phi_den) — via the sketch-then-verify pattern
    this repo uses wherever an approximate algorithm must stay
    oracle-exact (LSH dedup, PQ shortlist): a per-partition Misra-Gries
    sweep proposes candidates, then ONE exact aggregate over the
    candidate-restricted stream verifies. Output is provably identical
    to the exact computation: summing the per-partition MG guarantee,
    a term missed by every partition summary has total count
    <= N/(capacity+1) < ceil(N/phi_den), so candidates cover every true
    heavy hitter, and the exact HAVING removes all false positives —
    the sketch affects COST only, never the answer (the DuckDB oracle is
    the plain exact aggregate).

    Scale shape: the full token stream is touched twice, both times
    shuffle-free until the end — the MG pass is embarrassingly parallel
    with a capacity-bounded summary per partition, and the verify pass
    broadcast-semi-joins the candidate set (<= capacity x partitions
    terms) before a groupBy whose map-side partials only carry candidate
    terms. The all-terms groupBy a naive exact count would shuffle
    (vocabulary-sized — at 100 TB, trillions of distinct n-grams) never
    happens."""
    assert capacity > phi_den, (capacity, phi_den)
    toks = _docs(spark, sf_dir).select(F.explode(_toks()).alias("term"))
    n_total = toks.count()
    threshold = (n_total + phi_den - 1) // phi_den
    cand = toks.mapInPandas(_mg_sweep(capacity), "term string").distinct()
    return (
        toks.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
    )


def frequent_terms_sql(phi_den: int = MG_PHI_DEN) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
)
SELECT term, n FROM (SELECT term, count(*) AS n FROM toks GROUP BY term)
WHERE n >= (SELECT (count(*) + {phi_den - 1}) // {phi_den} FROM toks)"""
