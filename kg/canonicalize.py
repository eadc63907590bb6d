"""Stage 3 — canonicalization: connected components + canonical IDs.

Surface forms that alias each other (possibly through multi-hop chains,
e.g. line -> row -> record) must collapse to one canonical entity. We run
label propagation over the surface-similarity graph as an iterative
DataFrame self-join: every node starts with label = id64(node); each
round a node takes the min label among itself and its neighbors; converged
when no label changes. The component's canonical id is therefore
min(id64(member)) — deterministic (SURVEY §7.4.1; the reference's
Python-hash landmine, ``data/scripts/data_processor.py:84,95``).

Scale notes (north rule: "iterative DataFrame self-join with
large-component capping"):
* each iteration is one shuffle on the node key; ``localCheckpoint``
  truncates the lineage so plans don't grow with iterations;
* giant components (stop-word-like aliases) are capped: components larger
  than ``max_component`` revert to singleton labels, bounding both the
  join fan-out and downstream skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.ids import id64
from kg.vocab import alias_pairs


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    max_component: int | None = None,
) -> DataFrame:
    """(src:string, dst:string) undirected edges -> (node, label).

    ``label`` = min id64 over the node's component. Pure driver-side loop
    over stock operators (Catalyst can't express iteration; SURVEY §4.3).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = (
        sym.select(F.col("a").alias("node"))
        .unionByName(sym.select(F.col("b").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", id64(F.col("node"))).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nb_label", F.col("label"))).alias(
                    "label"
                ),
                (F.col("nb_label") < F.col("label")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break

    if max_component is not None:
        sizes = labels.groupBy("label").agg(F.count("*").alias("_sz"))
        labels = (
            labels.join(F.broadcast(sizes.filter(F.col("_sz") > max_component)), "label", "left_anti")
            .unionByName(
                labels.join(
                    F.broadcast(sizes.filter(F.col("_sz") > max_component)), "label"
                ).select("node", id64(F.col("node")).alias("label"))
            )
        )
    return labels


def canonical_map(spark: SparkSession, max_component: int | None = 1000) -> DataFrame:
    """(surface, canonical_id, canonical_name) over the alias graph.

    Canonical name = the component member whose id64 equals the component
    label (i.e. argmin id64). Surfaces with no alias edges are their own
    canonical entity.
    """
    pairs = [(s, t) for s, t in alias_pairs() if s != t]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    labels = connected_components(edges, max_component=max_component)
    # label -> canonical member name
    names = labels.filter(id64(F.col("node")) == F.col("label")).select(
        "label", F.col("node").alias("canonical_name")
    )
    mapped = labels.join(names, "label").select(
        F.col("node").alias("surface"),
        id64(F.concat(F.lit("ent:"), F.col("canonical_name"))).alias("canonical_id"),
        "canonical_name",
    )
    # identity rows for surfaces outside the alias graph
    all_surfaces = spark.createDataFrame(
        [(s, t) for s, t in alias_pairs()], "surface string, target string"
    )
    identity = all_surfaces.join(mapped, "surface", "left_anti").select(
        "surface",
        id64(F.concat(F.lit("ent:"), F.col("surface"))).alias("canonical_id"),
        F.col("surface").alias("canonical_name"),
    )
    return mapped.unionByName(identity)


def canonicalize_triples(triples_linked: DataFrame, canon: DataFrame) -> DataFrame:
    """Re-map provisional entity ids to canonical component ids."""
    ent_map = F.broadcast(
        canon.select(
            id64(F.concat(F.lit("ent:"), F.col("surface"))).alias("_from"),
            F.col("canonical_id").alias("_to"),
        ).distinct()
    )
    out = (
        triples_linked.join(
            ent_map.withColumnRenamed("_from", "subj_id").withColumnRenamed("_to", "_subj_to"),
            "subj_id",
            "left",
        )
        .join(
            ent_map.withColumnRenamed("_from", "obj_id").withColumnRenamed("_to", "_obj_to"),
            "obj_id",
            "left",
        )
        .select(
            "doc_id",
            "offset",
            F.coalesce("_subj_to", "subj_id").alias("subj_id"),
            "subj_kind",
            "pred",
            F.coalesce("_obj_to", "obj_id").alias("obj_id"),
            "obj_kind",
        )
    )
    return out
