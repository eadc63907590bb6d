"""Named queries over the KG pipeline — the driver-facing query surface.

Each function takes (spark, sf_dir) and returns a DataFrame whose exact
rows are reproduced by the matching SQL in kg.oracles (driver correctness
gate). Aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.canonicalize import canonical_map, canonicalize_triples
from kg.extract import extract_triples, extract_triples_pandas
from kg.link import alias_dict, link_triples
from kg.materialize import build_nodes, with_bucket
from kg.normalize import explode_spans, normalize_spans
from kg.synth import load_interleaved


def q_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return explode_spans(load_interleaved(spark, sf_dir))


def q_spans_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_spans(load_interleaved(spark, sf_dir))


def q_triples_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_triples(q_spans_norm(spark, sf_dir))


def q_triples_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics through the Arrow mapInPandas extractor slot."""
    return extract_triples_pandas(q_spans_norm(spark, sf_dir))


def q_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return link_triples(q_triples_surface(spark, sf_dir), alias_dict(spark))


def q_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return canonical_map(spark).select("surface", "canonical_id", "canonical_name")


def q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = canonical_map(spark)
    final = canonicalize_triples(q_linked(spark, sf_dir), canon)
    return final.select("subj_id", "pred", "obj_id", "doc_id", "offset")


def q_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    triples_surface = q_triples_surface(spark, sf_dir)
    canon = canonical_map(spark)
    final = canonicalize_triples(
        link_triples(triples_surface, alias_dict(spark)), canon
    )
    edges = with_bucket(
        final.select("subj_id", "pred", "obj_id", "doc_id", "offset"), 16
    )
    return build_nodes(triples_surface, canon, edges)


def _top_entities_from_edges(
    spark: SparkSession, edges: DataFrame, limit: int
) -> DataFrame:
    canon_names = (
        canonical_map(spark).select("canonical_id", "canonical_name").distinct()
    )
    # explode both endpoints in ONE pass — a subj/obj unionByName would
    # duplicate the entire upstream extraction DAG
    cnt = (
        edges.select(
            F.explode(F.array("subj_id", "obj_id")).alias("entity_id")
        )
        .groupBy("entity_id")
        .agg(F.count("*").alias("n_mentions"))
    )
    return (
        cnt.join(
            F.broadcast(canon_names),
            cnt.entity_id == canon_names.canonical_id,
        )
        .select(F.col("canonical_name").alias("name"), "n_mentions")
        .orderBy(F.desc("n_mentions"), F.asc("name"))
        .limit(limit)
    )


def q_top_entities(spark: SparkSession, sf_dir: str, limit: int = 20) -> DataFrame:
    """Flagship: most-mentioned canonical concepts (native-expression
    extraction path).

    NOTE on the two extraction paths: this native-expression variant costs
    3-4x the fused Arrow twin in one JVM (fresh-JVM timing at sf0.1,
    local[32]: 20.2 s vs 7.7 s — interpreted array-HOF extraction is
    allocation/GC-bound and anti-scales with threads; PLANS.md §2). It is
    kept as the DuckDB-oracle-parity path; the at-scale configuration is
    :func:`q_top_entities_fused`, which is also the pipeline default
    (``--extractor fused``)."""
    return _top_entities_from_edges(spark, q_edges(spark, sf_dir), limit)


def q_top_entities_fused(
    spark: SparkSession, sf_dir: str, limit: int = 20
) -> DataFrame:
    """Flagship through the fused Arrow kernel — the at-scale extraction
    configuration (kg/fused.py); same oracle as kg_top_entities (the two
    extraction paths are output-identical, asserted in tests/test_fused.py
    and by this query sharing kg_top_entities' oracle SQL)."""
    from kg.fused import fused_extract_triples

    triples = fused_extract_triples(spark, sf_dir)
    canon = canonical_map(spark)
    final = canonicalize_triples(link_triples(triples, alias_dict(spark)), canon)
    return _top_entities_from_edges(
        spark, final.select("subj_id", "pred", "obj_id", "doc_id", "offset"), limit
    )


# Blocking/component caps ACTIVE in the contract queries (round-2 VERDICT
# item 7): the 100x-safe configuration should be the one that is actually
# oracle-checked. Sized far above anything observed at sandbox SFs (the
# fixed 31-word vocabulary gives (prefix, band) blocks of <=10 surfaces
# and components of <=5 members), so results are unchanged — but the
# capped code path (deterministic per-block window, component reversion)
# is what every driver row now exercises; the caps BITING is covered by
# tests/test_plans.py::test_similarity_blocking_cap_bounds_pairs.
SIM_MAX_BLOCK = 1000
SIM_MAX_COMPONENT = 1000


def q_similarity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived surface-similarity graph over observed mention
    surfaces (blocked self-join + levenshtein; feeds connected
    components when no curated alias dictionary exists)."""
    from kg.canonicalize import surface_similarity_edges

    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    surfaces = (
        q_spans_norm(spark, sf_dir)
        .filter(F.col("kind") == "text")
        .select(F.explode(toks).alias("surface"))
    )
    return surface_similarity_edges(
        surfaces, max_distance=3, block_prefix=1, max_block=SIM_MAX_BLOCK
    )


def q_canonical_map_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star canonicalization mode: connected components over the
    corpus-derived surface-similarity graph (blocked levenshtein<=1), no
    curated dictionary. Covers every observed mention surface."""
    from kg.canonicalize import canonical_map_from_corpus

    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    surfaces = (
        q_spans_norm(spark, sf_dir)
        .filter(F.col("kind") == "text")
        .select(F.explode(toks).alias("surface"))
    )
    return canonical_map_from_corpus(
        surfaces,
        max_distance=1,
        block_prefix=1,
        max_block=SIM_MAX_BLOCK,
        max_component=SIM_MAX_COMPONENT,
    )


def q_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph profiling: out-degree distribution of the edges table —
    (out_degree, n_nodes). Two cheap aggregations; the first groupBy
    reuses the subject-hash bucketing of the materialized table at scale."""
    edges = q_edges(spark, sf_dir)
    deg = edges.groupBy("subj_id").agg(F.count("*").alias("out_degree"))
    return deg.groupBy("out_degree").agg(F.count("*").alias("n_nodes"))


def q_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop concept neighborhood: distinct (a, b, c) with a→b→c over
    concept-concept edges (media attachment edges excluded).

    Scale shape: project to DISTINCT (subj_id, obj_id) FIRST — bounded by
    the entity vocabulary squared, not the corpus — then self-join; on
    the bucketed edges table that join is bucket-co-located (see
    tests/test_bucketed.py for the shuffle-free evidence)."""
    edges = q_edges(spark, sf_dir).filter(~F.col("pred").startswith("has_"))
    # vocabulary-bounded: materialize once so the self-join doesn't
    # re-derive the extraction DAG on both sides
    pairs = edges.select("subj_id", "obj_id").distinct().localCheckpoint(eager=False)
    e2 = pairs.select(
        F.col("subj_id").alias("b"), F.col("obj_id").alias("c")
    )
    return (
        pairs.join(e2, pairs.obj_id == e2.b)
        .select(F.col("subj_id").alias("a"), F.col("obj_id").alias("b"), "c")
        .distinct()
    )


PR_SCALE = 1_000_000_000_000  # fixed-point 1e12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85
PR_ITERS = 3


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the concept graph, PR_ITERS unrolled
    iterations — (entity_id, rank) with rank scaled by PR_SCALE.

    ALL arithmetic is int64 (floor divisions): distributed iterative
    float aggregation is nondeterministic across engines AND across
    partitionings (sum order), so ranks are fixed-point integers — the
    same trick production graph engines use for reproducible iterative
    metrics. Each iteration is one shuffle on the destination key over
    the DISTINCT concept-pair projection (vocabulary-bounded, not
    corpus-bounded).
    """
    edges = q_edges(spark, sf_dir).filter(~F.col("pred").startswith("has_"))
    # materialize the vocabulary-bounded projection ONCE: without the
    # checkpoint every unrolled iteration re-executes the full extraction
    # DAG below the join (lineage grows per iteration — the SURVEY §4.3
    # iterative-plan landmine, same reason connected_components checkpoints)
    pairs = edges.select("subj_id", "obj_id").distinct().localCheckpoint()
    nodes = (
        pairs.select(F.col("subj_id").alias("entity_id"))
        .unionByName(pairs.select(F.col("obj_id").alias("entity_id")))
        .distinct()
    )
    n = nodes.count()  # vocabulary-sized; the literal feeds the base term
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
    deg = pairs.groupBy("subj_id").agg(F.count("*").alias("out_deg"))

    rank = nodes.withColumn("rank", F.lit(PR_SCALE // n).cast("long"))
    for _ in range(PR_ITERS):
        contrib = (
            pairs.join(rank, pairs.subj_id == rank.entity_id)
            .join(deg, "subj_id")
            .select(
                F.col("obj_id").alias("entity_id"),
                F.expr("rank div out_deg").alias("c"),
            )
            .groupBy("entity_id")
            .agg(F.sum("c").alias("in_sum"))
        )
        rank = (
            nodes.join(contrib, "entity_id", "left")
            .select(
                "entity_id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(in_sum, 0L)) div {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return rank


def pagerank_sql() -> str:
    from kg.oracles import edges_sql

    it = """
contrib{t} AS (
  SELECT p.obj_id AS entity_id, sum(r{p}.rank // d.out_deg) AS in_sum
  FROM cpairs p
  JOIN r{p} ON r{p}.entity_id = p.subj_id
  JOIN deg d ON d.subj_id = p.subj_id
  GROUP BY p.obj_id
),
r{t} AS (
  SELECT n.entity_id,
         CAST(base.b + ({dn} * coalesce(c.in_sum, 0)) // {dd} AS bigint) AS rank
  FROM pr_nodes n
  LEFT JOIN contrib{t} c USING (entity_id)
  CROSS JOIN base
)"""
    its = ",".join(
        it.format(t=i + 1, p=i, dn=PR_DAMP_NUM, dd=PR_DAMP_DEN)
        for i in range(PR_ITERS)
    )
    return (
        edges_sql().replace("SELECT * FROM edges", "")
        + f""",
cpairs AS (
  SELECT DISTINCT subj_id, obj_id FROM edges WHERE pred NOT LIKE 'has_%'
),
pr_nodes AS (
  SELECT subj_id AS entity_id FROM cpairs
  UNION SELECT obj_id FROM cpairs
),
nn AS (SELECT count(*) AS n FROM pr_nodes),
base AS (
  SELECT ({PR_SCALE} * ({PR_DAMP_DEN} - {PR_DAMP_NUM}))
           // ({PR_DAMP_DEN} * n) AS b,
         {PR_SCALE} // n AS r0
  FROM nn
),
deg AS (SELECT subj_id, count(*) AS out_deg FROM cpairs GROUP BY subj_id),
r0 AS (SELECT entity_id, base.r0 AS rank FROM pr_nodes CROSS JOIN base),
{its}
SELECT entity_id, rank FROM r{PR_ITERS}"""
    )


def q_pred_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_triples_surface(spark, sf_dir)
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
    )


def q_doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_spans(spark, sf_dir)
        .filter(F.col("kind") != "text")
        .groupBy("doc_id", "kind")
        .agg(F.count("*").alias("n_spans"))
    )
