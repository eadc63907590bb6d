"""Deterministic text -> embedding operator (SURVEY §3.2, the reference's
enrichment pipeline `embedding_generator.py`: batch-encode document text
into vectors; serving embeds the query text the same way before search).

The reference's encoder is a sentence-transformer; a real model drops
into the same Arrow slot as the extractor (kg/fused.py V1 +
KG_EXTRACTOR_COST). This module is the ORACLE-CHECKABLE stand-in: signed
feature hashing (same md5-hex-digit family as kg/ops/dedup.py simhash —
token -> md5 -> dimension index + sign, integer counts, L2 normalize),
so DuckDB reproduces every component bit-for-bit.

Scale shape: the Spark side is pure per-row native expressions — split,
one array-HOF fold building the signed counts, normalize — ZERO shuffles,
zero UDFs, whole-stage codegen; embedding N documents is embarrassingly
parallel. (The simhash cousin explodes tokens and groupBys; here the fold
keeps everything row-local, which is the shape a 100 TB encode job needs.)

Cross-engine float parity: per-dimension counts are exact integers in
both engines; norm = sqrt(integer) and component = round(count/norm, 4)
are single identical float64 ops on identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EMBED_DIM = 16
TOP_K = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tok_idx(t, dim: int):
    """Dimension index for a token: first two md5 hex digits mod dim."""
    return F.conv(F.substring(F.md5(t), 1, 2), 16, 10).cast("int") % dim


def _tok_sign(t):
    """±1 from the third md5 hex digit's parity."""
    return (F.conv(F.substring(F.md5(t), 3, 1), 16, 10).cast("int") % 2) * 2 - 1


def embed_text_col(text_col, dim: int = EMBED_DIM):
    """Column-level encoder: text column -> array<double> embedding. A
    stateless per-row expression, so it composes unchanged with batch
    scans AND Structured Streaming micro-batches (stream == batch is
    asserted in tests/test_streaming.py)."""
    # COALESCE keeps NULL text on the zero-vector path (parity with the
    # oracle's LEFT JOIN, which cannot distinguish NULL from token-less)
    toks = F.filter(
        F.split(F.coalesce(text_col, F.lit("")), " "),
        lambda w: w != F.lit(""),
    )
    # hash each token ONCE into (dim index, sign) before the fold — HOF
    # lambdas are interpreted with no common-subexpression elimination,
    # so folding over raw tokens would recompute the md5 pair for every
    # one of the `dim` accumulator slots (2 hashes/token, not 2*dim)
    hashed = F.transform(
        toks,
        lambda t: F.struct(
            _tok_idx(t, dim).alias("d"), _tok_sign(t).alias("sgn")
        ),
    )
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, h: F.transform(
            acc,
            lambda x, i: x
            + F.when(h["d"] == i, h["sgn"].cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
    )
    # bind the fold result ONCE via a 1-element array lambda — inlining
    # `counts` into both the norm and the normalize transform would
    # re-evaluate the md5 fold per reference (no CSE across expressions)
    def normalize(s):
        norm2 = F.aggregate(s, F.lit(0).cast("long"), lambda a, x: a + x * x)
        norm = F.sqrt(norm2.cast("double"))
        return F.transform(
            s,
            lambda x: F.when(norm2 == 0, F.lit(0.0)).otherwise(
                F.round(x.cast("double") / norm, 4)
            ),
        )

    return F.element_at(F.transform(F.array(counts), normalize), 1)


def embed_documents(
    spark: SparkSession, sf_dir: str, dim: int = EMBED_DIM
) -> DataFrame:
    """(doc_id, v: array<double>) — unit-norm signed-feature-hash
    embedding of every document; token-less documents embed to the zero
    vector. One scan, per-row fold, no shuffle."""
    return _docs(spark, sf_dir).select(
        "doc_id", embed_text_col(F.col("text"), dim).alias("v")
    )


def embed_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract projection of :func:`embed_documents`: (doc_id, e0..e15)
    as flat double columns (array-valued columns don't survive the
    driver's sort-then-hash comparison)."""
    e = embed_documents(spark, sf_dir)
    return e.select(
        "doc_id",
        *[F.col("v")[k].alias(f"e{k}") for k in range(EMBED_DIM)],
    )


def _embed_cte(dim: int = EMBED_DIM) -> str:
    """DuckDB CTE chain ending in `emb(doc_id, e0..e{dim-1})` — the
    oracle twin of :func:`embed_documents` (token-less docs -> zeros via
    the LEFT JOIN + COALESCE path)."""
    sums = ", ".join(
        f"CAST(COALESCE(sum(CASE WHEN d = {k} THEN sgn END), 0) AS BIGINT)"
        f" AS s{k}"
        for k in range(dim)
    )
    norm2 = " + ".join(f"s{k}*s{k}" for k in range(dim))
    comps = ", ".join(
        f"CASE WHEN COALESCE(n.norm, 0) = 0 THEN 0.0"
        f" ELSE round(n.s{k}/n.norm, 4) END AS e{k}"
        for k in range(dim)
    )
    return f"""tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(COALESCE(text,''),' '), x -> x <> '')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok),1,2))::int % {dim} AS d,
         (('0x' || substr(md5(tok),3,1))::int % 2) * 2 - 1 AS sgn
  FROM tok
),
sums AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
n AS (SELECT *, sqrt(({norm2})::double) AS norm FROM sums),
emb AS (
  SELECT docs.doc_id, {comps}
  FROM documents docs LEFT JOIN n ON docs.doc_id = n.doc_id
)"""


def embed_flat_sql() -> str:
    cols = ", ".join(f"e{k}" for k in range(EMBED_DIM))
    return f"WITH {_embed_cte()} SELECT doc_id, {cols} FROM emb"


def text_query_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """The serving flow end-to-end, oracle-checked: embed the corpus,
    take the lowest-doc_id document's embedding as the query (a stand-in
    for an ad-hoc embedded query string — same encoder either way), score
    everything else by dot product, return top-k (doc_id, rank, cos).

    Plan: the 1-row query side broadcasts (no corpus shuffle before the
    TakeOrderedAndProject top-k)."""
    emb = embed_documents(spark, sf_dir)
    q = (
        emb.orderBy("doc_id")
        .limit(1)
        .select(F.col("doc_id").alias("qid"), F.col("v").alias("qv"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        emb.join(F.broadcast(q))
        .filter(F.col("doc_id") != F.col("qid"))
        .withColumn("cos", F.round(dot, 4))
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "rank", "cos"
    )


def text_query_topk_sql() -> str:
    dot = " + ".join(f"emb.e{k}*q.e{k}" for k in range(EMBED_DIM))
    return f"""WITH {_embed_cte()},
q AS (SELECT * FROM emb ORDER BY doc_id LIMIT 1),
scored AS (
  SELECT emb.doc_id, round({dot}, 4) AS cos
  FROM emb, q WHERE emb.doc_id <> q.doc_id
)
SELECT doc_id, rank, cos FROM (
  SELECT doc_id, cos,
         row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}"""
