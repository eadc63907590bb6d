"""Stage 4 — graph materialization: bucketed nodes/edges + resumable commit.

Edges are bucketed by subject hash (``bucket = pmod(subj_id, n_buckets)``)
so downstream per-subject traversals and joins co-locate without a
shuffle; buckets are written in ``n_groups`` partition groups, each group
committed to the manifest *after* its data is durable. A killed run
re-executes only the uncommitted groups (anti-join against the manifest),
and the final table is byte-equal to a single-run write.

Reference analog: the partition-identity thread part-NNNN.parquet ->
part-NNNN_embeddings.npy -> per-partition Milvus insert loop
(``infra/scripts/load_data.py:51-92``), minus the positional-alignment
fragility: identity here is an explicit bucket column.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg import manifest as mf
from kg.ids import id64


class InjectedFailure(RuntimeError):
    """Raised by tests to simulate a mid-run kill between partition groups."""


def parquet_rows(path: str) -> int:
    """Exact row count from parquet footers, read driver-side (no Spark
    job). The staged-write commit loop and the pipeline's final counts
    used to pay a full Spark job each (~0.2-0.4 s of scheduling per
    count, 6+ jobs per pipeline run) for what is a metadata read; at
    cluster scale this is the same footer metadata, fetched through the
    filesystem client instead of a distributed job."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def with_bucket(edges: DataFrame, n_buckets: int) -> DataFrame:
    return edges.withColumn(
        "bucket", F.pmod(F.col("subj_id"), F.lit(n_buckets)).cast("int")
    )


def edges_path(out_dir: str) -> str:
    return os.path.join(out_dir, "edges")


def nodes_path(out_dir: str) -> str:
    return os.path.join(out_dir, "nodes")


def materialize_partitioned(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    table_name: str,
    *,
    run_id: str,
    lineage: str,
    group_col,
    n_groups: int,
    sort_cols: list[str],
    range_cols: list[str] | None = None,
    stage: str | None = None,
    fail_after_groups: int | None = None,
) -> int:
    """Generic resumable partition-group writer (the north rule's
    per-partition checkpoint applied to ANY stage output, not just the
    final tables): group ``g`` = rows with ``group_col % n_groups == g``,
    written to ``<out>/<table>/part_group=g`` then committed to the
    manifest; committed groups are skipped on rerun. Returns rows written
    by THIS call."""
    stage = stage or f"materialize_{table_name}"
    done = mf.committed_partitions(spark, out_dir, stage, lineage)
    table_dir = os.path.join(out_dir, table_name)

    # Stale-dir hygiene: a part_group=N dir NOT committed under THIS
    # lineage is either a partial write (kill mid-move) or debris from a
    # different lineage — e.g. a rerun with a different n_groups modulus,
    # which reinterprets group ids (lineage now includes n_groups, so that
    # rerun sees done=∅ and this sweep clears the whole table). Anything
    # left behind would be silently double-read by the final
    # spark.read.parquet(table_dir).
    if os.path.isdir(table_dir):
        for entry in os.listdir(table_dir):
            keep = False
            if entry.startswith("part_group="):
                try:
                    keep = int(entry.split("=", 1)[1]) in done
                except ValueError:
                    keep = False
            if not keep:
                full = os.path.join(table_dir, entry)
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                else:
                    os.remove(full)

    remaining = [g for g in range(n_groups) if g not in done]
    if not remaining:
        return 0

    # ONE job writes every uncommitted group via partitionBy("part_group")
    # into a staging dir (round-1 wrote each group in its own job, which
    # re-ran the whole upstream plan n_groups times); groups are then
    # promoted into the table dir and committed one at a time, so the
    # resume granularity (and the manifest contract) is unchanged.
    staging = os.path.join(out_dir, "_staging", table_name)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    part_group = F.pmod(group_col, F.lit(n_groups)).cast("int")
    subset = df.withColumn("part_group", part_group)
    if len(remaining) < n_groups:
        subset = subset.filter(F.col("part_group").isin(remaining))
    # deterministic file layout: HASH-partition on (part_group, first
    # cluster col) then sort inside. Hash, not repartitionByRange: the
    # range partitioner runs a SAMPLING job that executes the entire
    # upstream plan (extraction kernel included) a second time before
    # the real shuffle (guide §2.4 — an Exchange you did not expect;
    # measured at sf0.1 x64: 15.2 s range vs 9.6 s hash for the same
    # write). Hash partitioning is equally deterministic. The hash key
    # deliberately stops at the FIRST cluster col (the bucket): with
    # part_group a function of the bucket, every task's rows for one
    # bucket land in one file — hashing finer (bucket, subj_id) spread
    # each part_group across every task and wrote n_tasks x n_groups
    # tiny files, which cost ~1 s per downstream scan of the table
    # (guide §6, small files hurt twice). No explicit partition count:
    # AQE sizes the write stage from the actual shuffle bytes
    # (advisoryPartitionSizeInBytes), so a small run writes a few
    # right-sized files instead of one near-empty file per core while a
    # large run keeps full write parallelism — the scale-adaptive
    # partitioning the round brief demands (a fixed n_write=parallelism
    # was tuned to the big case and flooded every downstream scan of
    # the small case with tiny map tasks; the upstream extraction keeps
    # its own width either way, AQE only coalesces the post-shuffle
    # sort+encode side).
    # REBALANCE rather than plain repartition(cols): same hash
    # clustering, but AQE may also SPLIT an oversized partition (one hot
    # bucket at real scale) instead of only merging small ones — the
    # split bucket just writes two sorted files.
    cluster = [F.col("part_group")] + [
        F.col(c) for c in (range_cols or sort_cols[:2])[:1]
    ]
    subset.hint("rebalance", *cluster).sortWithinPartitions(
        "part_group", *sort_cols
    ).write.mode("overwrite").partitionBy("part_group").parquet(staging)

    total = 0
    for g in remaining:
        if fail_after_groups is not None and len(done) >= fail_after_groups:
            raise InjectedFailure(f"injected failure before group {g}")
        started = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        src = os.path.join(staging, f"part_group={g}")
        dst = os.path.join(table_dir, f"part_group={g}")
        rows = 0
        if os.path.exists(src):  # an empty group writes no partition dir
            os.makedirs(table_dir, exist_ok=True)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.move(src, dst)
            rows = parquet_rows(dst)  # driver-side footer count, no job
        mf.commit_partition(
            spark,
            out_dir,
            run_id=run_id,
            stage=stage,
            partition_id=g,
            rows_in=None,
            rows_out=rows,
            skip_reasons=None,
            started_at=started,
            lineage=lineage,
        )
        done.add(g)
        total += rows
    shutil.rmtree(os.path.join(out_dir, "_staging"), ignore_errors=True)
    return total


def materialize_edges(
    spark: SparkSession,
    edges: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    lineage: str,
    n_buckets: int = 64,
    n_groups: int = 4,
    fail_after_groups: int | None = None,
) -> int:
    """Write bucketed edges in resumable partition groups; return rows written
    across groups committed *by this call*."""
    bucketed = with_bucket(edges, n_buckets)
    return materialize_partitioned(
        spark,
        bucketed,
        out_dir,
        "edges",
        run_id=run_id,
        lineage=lineage,
        group_col=F.col("bucket"),
        n_groups=n_groups,
        sort_cols=["bucket", "subj_id", "pred", "obj_id", "doc_id", "offset"],
        range_cols=["bucket", "subj_id"],
        stage="materialize_edges",
        fail_after_groups=fail_after_groups,
    )


def build_nodes(
    triples_surface: DataFrame, canon: DataFrame, edges_final: DataFrame
) -> DataFrame:
    """NODES table: concept nodes from the canonical map, document/media
    nodes from surface triples, mention counts from final edges."""
    concepts = canon.select(
        F.col("canonical_id").alias("entity_id"),
        F.col("canonical_name").alias("name"),
        F.lit("concept").alias("kind"),
    ).distinct()
    # doc + media nodes in ONE pass over the media rows (a docs/media
    # union of two selects re-derives the whole extraction subtree twice)
    media_rows = triples_surface.filter(F.col("subj_pos") < 0)
    doc_media = (
        media_rows.select(
            F.explode(
                F.array(
                    F.struct(
                        id64(F.concat(F.lit("doc:"), F.col("doc_id"))).alias(
                            "entity_id"
                        ),
                        F.col("doc_id").alias("name"),
                        F.lit("document").alias("kind"),
                    ),
                    F.struct(
                        id64(F.col("obj_surface")).alias("entity_id"),
                        F.col("obj_surface").alias("name"),
                        F.lit("media").alias("kind"),
                    ),
                )
            ).alias("n")
        )
        .select("n.entity_id", "n.name", "n.kind")
        .distinct()
    )
    all_nodes = concepts.unionByName(doc_media)
    # single-pass endpoint explode (a union of two selects over the same
    # plan would recompute the whole upstream DAG twice when uncached)
    mentions = (
        edges_final.select(
            F.explode(F.array("subj_id", "obj_id")).alias("entity_id")
        )
        .groupBy("entity_id")
        .agg(F.count("*").alias("n_mentions"))
    )
    return all_nodes.join(mentions, "entity_id", "left").select(
        "entity_id",
        "name",
        "kind",
        F.coalesce("n_mentions", F.lit(0)).cast("long").alias("n_mentions"),
    )


def build_nodes_from_edges(
    canon: DataFrame,
    edges_final: DataFrame,
    concepts: DataFrame | None = None,
) -> DataFrame:
    """NODES rebuilt purely from the materialized edges table (plus the
    tiny canonical map) — no re-run of the extraction kernel.

    Works because media edges carry everything needed to reconstruct the
    node names: ``pred = 'has_<kind>'``, ``doc_id = 'doc-%07d' % n`` and
    ``media_ref = 'media://<kind>/<n>-<offset>'`` (kg.synth derivation
    contract). Equality with :func:`build_nodes` is asserted in tests.

    ``concepts`` (r06): an already-distinct (entity_id, name, kind) frame
    — dictionary mode passes kg.canonicalize.canonical_concepts, which
    dedupes the static map driver-side instead of paying a runtime
    Exchange for a dictionary-sized distinct.
    """
    if concepts is None:
        concepts = canon.select(
            F.col("canonical_id").alias("entity_id"),
            F.col("canonical_name").alias("name"),
            F.lit("concept").alias("kind"),
        ).distinct()
    media_edges = edges_final.filter(F.col("pred").startswith("has_"))
    doc_num = F.substring(F.col("doc_id"), 5, 20).cast("long")
    # doc + media nodes in ONE pass over the media rows (r06: the
    # docs/media two-select union scanned the edges table twice and paid
    # two distinct exchanges; one explode + one distinct halves both —
    # same single-pass shape build_nodes already uses)
    doc_media = (
        media_edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("subj_id").alias("entity_id"),
                        F.col("doc_id").alias("name"),
                        F.lit("document").alias("kind"),
                    ),
                    F.struct(
                        F.col("obj_id").alias("entity_id"),
                        F.concat(
                            F.lit("media://"),
                            F.substring(F.col("pred"), 5, 100),
                            F.lit("/"),
                            doc_num,
                            F.lit("-"),
                            F.col("offset"),
                        ).alias("name"),
                        F.lit("media").alias("kind"),
                    ),
                )
            ).alias("n")
        )
        .select("n.entity_id", "n.name", "n.kind")
        .distinct()
    )
    all_nodes = concepts.unionByName(doc_media)
    mentions = (
        edges_final.select(
            F.explode(F.array("subj_id", "obj_id")).alias("entity_id")
        )
        .groupBy("entity_id")
        .agg(F.count("*").alias("n_mentions"))
    )
    return all_nodes.join(mentions, "entity_id", "left").select(
        "entity_id",
        "name",
        "kind",
        F.coalesce("n_mentions", F.lit(0)).cast("long").alias("n_mentions"),
    )


def materialize_nodes(
    spark: SparkSession,
    nodes: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    lineage: str,
) -> int:
    done = mf.committed_partitions(spark, out_dir, "materialize_nodes", lineage)
    if 0 in done:
        return 0
    started = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    path = nodes_path(out_dir)
    # shard by entity hash; no explicit shard count — AQE sizes the
    # write stage from actual bytes (advisory size), so the table gets
    # a few right-sized files at small scale and full parallelism at
    # large scale instead of a fixed parallelism-many near-empty files
    nodes.repartition("entity_id").sortWithinPartitions(
        "entity_id"
    ).write.mode("overwrite").parquet(path)
    rows = parquet_rows(path)  # driver-side footer count, no job
    mf.commit_partition(
        spark,
        out_dir,
        run_id=run_id,
        stage="materialize_nodes",
        partition_id=0,
        rows_in=None,
        rows_out=rows,
        skip_reasons=None,
        started_at=started,
        lineage=lineage,
    )
    return rows


def write_bucketed_table(
    spark: SparkSession,
    edges: DataFrame,
    table: str = "kg_edges_bucketed",
    n_buckets: int = 16,
) -> str:
    """Materialize edges as a REAL Spark bucketed table (bucketBy subj_id,
    sorted within buckets): self-joins and repeated per-subject joins read
    co-located buckets with NO shuffle exchange on either side — the
    at-scale payoff of bucketing the graph by subject hash. (Plain
    parquet directories can't carry bucket metadata; this goes through
    the session catalog / warehouse dir.) Returns the table name."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous session may have dropped the metadata but left the
    # managed location behind — clear it so saveAsTable doesn't refuse.
    # Only when the warehouse conf resolves to an absolute path: an empty
    # conf would make the join CWD-relative and rmtree an unrelated dir.
    warehouse = (spark.conf.get("spark.sql.warehouse.dir", "") or "").removeprefix(
        "file:"
    )
    if warehouse and os.path.isabs(warehouse):
        loc = os.path.join(warehouse, table.lower())
        if os.path.exists(loc):
            shutil.rmtree(loc)
    (
        edges.write.bucketBy(n_buckets, "subj_id")
        .sortBy("subj_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    return table


def reset_output(out_dir: str) -> None:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
