"""Similarity search over the embeddings table (SURVEY §2.6 J2 / §2.8).

The reference serves kNN through a Milvus HNSW index
(``api/milvus_adapter.py:80-94``); here:

* :func:`bruteforce_topk` — exact cosine top-k (the correctness baseline;
  one narrow scan + a global top-k, no index needed);
* :func:`lsh_topk` — sign-bucket LSH variant (the scale path: candidates
  restricted to the query's hyperplane-sign bucket before scoring; at
  100 TB the bucket column is a partition key, so a query touches one
  partition instead of the full table).

Query vector = the embedding of QUERY_VEC_ID (deterministic; the
reference similarly probes with vectors drawn from the collection,
``bench/coldWarmLatency.py:34-45``). Dots computed in float64; ranks
tie-broken by vec_id so results are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg.ops.dedup import _sign_bucket

QUERY_VEC_ID = 0
TOP_K = 10
SEARCH_SIGN_BITS = 4  # 16 buckets — coarser than dedup blocking so each
# bucket holds enough candidates for a meaningful top-k

# IVF coarse quantizer: centroids are a fixed, deterministic subset of the
# collection (vec_ids 1..N_CELLS) — a seeded-kmeans stand-in that keeps the
# assignment exactly reproducible in DuckDB. Queries probe the N_PROBE
# nearest cells (classic IVF recall/latency dial).
IVF_CELLS = 8
IVF_PROBE = 2


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = F.broadcast(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return (
        e.crossJoin(q)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("cos", F.round(dot, 4))
    )


def bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: (vec_id, label-free rank, cos)."""
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        _scored(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", "cos")
    )


def bruteforce_topk_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::double) AS v FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, round(list_dot_product(e.v, q.qv), 4) AS cos
  FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, rank, cos FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}"""


def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k within the query's sign bucket."""
    e = _emb(spark, sf_dir).withColumn(
        "bucket", _sign_bucket(F.col("v"), SEARCH_SIGN_BITS)
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        e.join(q, F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("cos", F.round(dot, 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", "cos")
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse centroid
    (argmax dot over IVF_CELLS fixed centroids), probe the IVF_PROBE cells
    nearest to the query, score only vectors in probed cells.

    At scale the cell id is the partition key: a query touches
    IVF_PROBE/IVF_CELLS of the data. Output (vec_id, rank, cos).
    """
    e = _emb(spark, sf_dir)
    cents = F.broadcast(
        e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= IVF_CELLS)).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv")
        )
    )
    dot_cv = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cdot"), F.asc("cell")
    )
    assigned = (
        e.crossJoin(cents)
        .withColumn("cdot", dot_cv)
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") == 1)
        .select("vec_id", "v", "cell")
    )
    # probe cells = IVF_PROBE best cells for the query vector
    probe = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .crossJoin(cents)
        .withColumn("cdot", dot_cv)
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") <= IVF_PROBE)
        .select(F.col("cell").alias("pcell"))
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    )
    dot_q = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(probe), assigned.cell == F.col("pcell"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(q)
        .withColumn("cos", F.round(dot_q, 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "rank", "cos")
    )


def ivf_topk_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::double) AS v FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND {IVF_CELLS}
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell ASC) AS crank
    FROM e CROSS JOIN cents c
  ) WHERE crank = 1
),
probe AS (
  SELECT cell AS pcell FROM (
    SELECT c.cell,
           row_number() OVER (
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell ASC) AS crank
    FROM e CROSS JOIN cents c WHERE e.vec_id = {QUERY_VEC_ID}
  ) WHERE crank <= {IVF_PROBE}
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT a.vec_id, round(list_dot_product(a.v, q.qv), 4) AS cos
  FROM assigned a JOIN probe p ON a.cell = p.pcell, q
  WHERE a.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, rank, cos FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}"""


def lsh_topk_sql() -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SEARCH_SIGN_BITS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::double) AS v,
         CAST({bucket} AS int) AS bucket
  FROM embeddings
),
q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, round(list_dot_product(e.v, q.qv), 4) AS cos
  FROM e, q WHERE e.bucket = q.qbucket AND e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, rank, cos FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}"""
