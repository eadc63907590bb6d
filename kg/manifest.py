"""Per-partition checkpoint / lineage / metrics manifest.

Upgrade of the reference's weak fault model (partition-scoped try/except +
``partitions_processed`` stats list, ``embed/embedding_generator.py:329-337``)
into a committed manifest table: one row per (run lineage, stage,
partition-group) with counters and timestamps. Resume = skip groups whose
``status='committed'`` row exists for the same lineage fingerprint, so a
killed run restarts exactly after the last durable partition.

Stored as an append-only Parquet directory (the Iceberg-ready seam: swap
the two read/append functions for an Iceberg table without touching
callers — SURVEY §7.4.7).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession

from kg.schemas import MANIFEST

STATUS_COMMITTED = "committed"


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    path = manifest_path(out_dir)
    try:
        return spark.read.schema(MANIFEST).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST)


def committed_partitions(
    spark: SparkSession, out_dir: str, stage: str, lineage: str
) -> set[int]:
    m = read_manifest(spark, out_dir)
    rows = (
        m.filter(
            (m.stage == stage)
            & (m.status == STATUS_COMMITTED)
            & (m.lineage == lineage)
        )
        .select("partition_id")
        .collect()
    )
    return {r.partition_id for r in rows}


def commit_partition(
    spark: SparkSession,
    out_dir: str,
    *,
    run_id: str,
    stage: str,
    partition_id: int,
    rows_in: int | None,
    rows_out: int | None,
    skip_reasons: dict[str, int] | None,
    started_at: _dt.datetime,
    lineage: str,
) -> None:
    """Append one committed row. The append is the commit point: the data
    write for this partition group must already be durable when called."""
    row = [
        (
            run_id,
            stage,
            partition_id,
            STATUS_COMMITTED,
            rows_in,
            rows_out,
            skip_reasons or {},
            started_at,
            _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
            lineage,
        )
    ]
    spark.createDataFrame(row, MANIFEST).coalesce(1).write.mode("append").parquet(
        manifest_path(out_dir)
    )
