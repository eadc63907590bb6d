"""Driver orchestration: ingest -> extract -> link -> canonicalize -> materialize.

CLI entry for ``spark-submit --py-files kg.zip kg/pipeline.py --sf-dir ...``.
Stages are declarative DataFrame plans; only iteration (connected
components) and the resumable commit loop live on the driver (SURVEY §4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

if __package__ in (None, ""):  # `python kg/pipeline.py` (no spark-submit --py-files)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.canonicalize import canonical_map, canonicalize_triples
from kg.extract import extract_triples, extract_triples_pandas
from kg.link import alias_dict, link_triples
from kg.materialize import (
    build_nodes,
    materialize_edges,
    materialize_nodes,
    with_bucket,
)
from kg.normalize import normalize_spans
from kg.session import get_spark
from kg.synth import load_interleaved


def build_edges(
    docs: DataFrame,
    spark: SparkSession,
    extractor: str = "sql",
    pandas_normalize: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Logical plan through stage 3. Returns (triples_surface, canon, edges)."""
    spans = normalize_spans(docs, use_pandas=pandas_normalize)
    if extractor == "pandas":
        triples_surface = extract_triples_pandas(spans)
    else:
        triples_surface = extract_triples(spans)
    linked = link_triples(triples_surface, alias_dict(spark))
    canon = canonical_map(spark)
    final = canonicalize_triples(linked, canon)
    return triples_surface, canon, final


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    extractor: str = "sql",
    pandas_normalize: bool = False,
    run_id: str | None = None,
    n_buckets: int = 16,
    n_groups: int = 4,
    fail_after_groups: int | None = None,
) -> dict:
    """End-to-end run (resumable: rerun with same out_dir/sf_dir skips
    committed partition groups). Returns a stats dict."""
    run_id = run_id or uuid.uuid4().hex[:12]
    lineage = f"sf_dir={sf_dir};extractor={extractor};buckets={n_buckets}"
    t0 = time.time()

    docs = load_interleaved(spark, sf_dir)
    triples_surface, canon, final = build_edges(
        docs, spark, extractor=extractor, pandas_normalize=pandas_normalize
    )
    final = final.persist()
    try:
        n_edges_written = materialize_edges(
            spark,
            final.select("subj_id", "pred", "obj_id", "doc_id", "offset"),
            out_dir,
            run_id=run_id,
            lineage=lineage,
            n_buckets=n_buckets,
            n_groups=n_groups,
            fail_after_groups=fail_after_groups,
        )
        edges_final = with_bucket(
            final.select("subj_id", "pred", "obj_id", "doc_id", "offset"), n_buckets
        )
        nodes = build_nodes(triples_surface, canon, edges_final)
        n_nodes = materialize_nodes(
            spark, nodes, out_dir, run_id=run_id, lineage=lineage
        )
        n_edges_total = spark.read.parquet(f"{out_dir}/edges").count()
    finally:
        final.unpersist()

    wall = time.time() - t0
    return {
        "run_id": run_id,
        "lineage": lineage,
        "edges_written_this_run": n_edges_written,
        "edges_total": n_edges_total,
        "nodes": n_nodes,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_edges_total / wall, 1) if wall > 0 else None,
    }


def main() -> None:
    p = argparse.ArgumentParser(description="kg construction pipeline")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--extractor", choices=["sql", "pandas"], default="sql")
    p.add_argument("--pandas-normalize", action="store_true")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--n-groups", type=int, default=4)
    p.add_argument("--run-id", default=None)
    args = p.parse_args()

    spark = get_spark(app="kg-pipeline", cores=args.cores)
    try:
        stats = run_pipeline(
            spark,
            args.sf_dir,
            args.out,
            extractor=args.extractor,
            pandas_normalize=args.pandas_normalize,
            run_id=args.run_id,
            n_buckets=args.n_buckets,
            n_groups=args.n_groups,
        )
        print(json.dumps(stats))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
