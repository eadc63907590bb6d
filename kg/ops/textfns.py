"""Reference string-function parity (SURVEY §2.3 T7/T9/T10), oracle-exact.

T7 ``create_search_text`` (``data/scripts/text_cleaner.py:129-153``):
   join two fields with '. ', appending '.' to the first iff it lacks
   terminal punctuation. Here: source field + text prefix.
T9 ``extract_paper_id`` (``data/scripts/data_processor.py:70-100``):
   structured id 'YYMM.NNNNN' -> YYMM*100000+NNNNN, else a DETERMINISTIC
   hash fallback (the reference used process-salted Python hash() — the
   landmine SURVEY §7.4.1 flags; we use id64 % 1e10).
T10 ``normalize_categories`` (``infra/scripts/load_data.py:14-22``):
   list -> sorted comma-joined string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.ids import id64, sql_id64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def search_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: title-like field = source; body = first 50 chars of text."""
    d = _docs(spark, sf_dir)
    title = F.col("source")
    body = F.trim(F.substring(F.col("text"), 1, 50))
    dotted = F.when(
        title.rlike("[.!?]$"), title
    ).otherwise(F.concat(title, F.lit(".")))
    return d.select(
        "doc_id", F.concat(dotted, F.lit(" "), body).alias("search_text")
    )


def search_text_sql() -> str:
    return """
SELECT doc_id,
       (CASE WHEN regexp_matches(source, '[.!?]$') THEN source
             ELSE source || '.' END) || ' ' || trim(substr(text, 1, 50))
         AS search_text
FROM documents"""


def structured_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 over a synthesized arXiv-style id: docs with even doc_id get
    'YYMM.NNNNN' form (parseable), odd get an old-style string (fallback
    hash path). Output (doc_id, raw_id, paper_id)."""
    d = _docs(spark, sf_dir)
    raw = F.when(
        F.col("doc_id") % 2 == 0,
        F.format_string("%04d.%05d", (F.col("doc_id") % 10000), F.col("doc_id") % 100000),
    ).otherwise(F.format_string("cs/old-%d", F.col("doc_id")))
    d = d.select("doc_id", raw.alias("raw_id"))
    parsed = (
        F.split(F.col("raw_id"), "\\.")[0].cast("long") * 100000
        + F.split(F.col("raw_id"), "\\.")[1].cast("long")
    )
    fallback = F.pmod(id64(F.col("raw_id")), F.lit(10_000_000_000))
    return d.select(
        "doc_id",
        "raw_id",
        F.when(F.col("raw_id").rlike("^[0-9]{4}\\.[0-9]{5}$"), parsed)
        .otherwise(fallback)
        .alias("paper_id"),
    )


def structured_id_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN printf('%04d.%05d', doc_id % 10000, doc_id % 100000)
              ELSE printf('cs/old-%d', doc_id) END AS raw_id
  FROM documents
)
SELECT doc_id, raw_id,
       CASE WHEN regexp_matches(raw_id, '^[0-9]{{4}}\\.[0-9]{{5}}$')
            THEN CAST(string_split(raw_id, '.')[1] AS bigint) * 100000
                 + CAST(string_split(raw_id, '.')[2] AS bigint)
            ELSE {sql_id64('raw_id')} % 10000000000 END AS paper_id
FROM d"""


def normalized_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 over a synthesized multi-label list (lang + source + parity)."""
    d = _docs(spark, sf_dir)
    cats = F.array(
        F.col("lang"),
        F.col("source"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
    )
    return d.select(
        "doc_id", F.array_join(F.array_sort(cats), ",").alias("categories_norm")
    )


def normalized_categories_sql() -> str:
    return """
SELECT doc_id,
       array_to_string(list_sort([lang, source,
           CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END]), ',')
         AS categories_norm
FROM documents"""


# F2 — allowlist substring-membership category filter
# (``data/scripts/data_processor.py:126-131`` keeps a record iff ANY
# allowlisted category occurs as a SUBSTRING of the record's categories
# string; allowlist from ``data/scripts/config.py:48-56``). 'src1' matches
# src1 AND src10..src19 — exactly the substring semantics (the reference's
# 'cs.' prefix matches every cs.* subcategory).
CATEGORY_ALLOWLIST = ["en", "src1"]


def category_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: keep docs whose categories string contains any allowlisted
    category as a substring; emit the matched categories for audit.
    Output (doc_id, categories, matched)."""
    d = _docs(spark, sf_dir)
    cats = F.array_join(
        F.array_sort(
            F.array(
                F.col("lang"),
                F.col("source"),
                F.when(F.col("doc_id") % 2 == 0, F.lit("even")).otherwise(
                    F.lit("odd")
                ),
            )
        ),
        ",",
    )
    allow = F.array(*[F.lit(c) for c in CATEGORY_ALLOWLIST])
    d = d.select("doc_id", cats.alias("categories"))
    return d.filter(
        F.exists(allow, lambda c: F.col("categories").contains(c))
    ).select(
        "doc_id",
        "categories",
        F.array_join(
            F.filter(allow, lambda c: F.col("categories").contains(c)), ","
        ).alias("matched"),
    )


def category_filter_sql() -> str:
    allow = "[" + ", ".join(f"'{c}'" for c in CATEGORY_ALLOWLIST) + "]"
    return f"""
WITH d AS (
  SELECT doc_id,
         array_to_string(list_sort([lang, source,
             CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END]), ',')
           AS categories
  FROM documents
)
SELECT doc_id, categories,
       array_to_string(list_filter({allow}, c -> contains(categories, c)), ',')
         AS matched
FROM d
WHERE len(list_filter({allow}, c -> contains(categories, c))) > 0"""
