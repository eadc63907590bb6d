"""Capture .explain("formatted") for the bench-cell query plans.

Usage: python scripts/capture_plans.py <out_dir> [suffix]

Writes <out_dir>/<name>_<suffix>.txt for every captured plan (suffix
defaults to "after"). Run from a worktree of the round-start commit with
suffix "before" to produce the comparison set (the judge checks plan
claims in OPTIMIZATION_r06.md against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kg.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app="plan-capture", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from kg.fused import fused_extract_triples
    from kg.materialize import with_bucket
    from kg.ops import dedup, relational, simsearch
    from kg.queries import q_top_entities, q_top_entities_fused

    plans = {
        "kg_top_entities": q_top_entities(spark, SF_DIR),
        "kg_top_entities_fused": q_top_entities_fused(spark, SF_DIR),
        "dd_neardup_pairs": dedup.neardup_pairs(spark, SF_DIR),
        "dd_exact_survivors": dedup.exact_survivors(spark, SF_DIR),
        "ss_bruteforce_topk": simsearch.bruteforce_topk(spark, SF_DIR),
        "rel_pricing_summary": relational.pricing_summary(spark, SF_DIR),
        "rel_revenue_by_nation": relational.revenue_by_nation(spark, SF_DIR),
    }

    # the pipeline's staged-write input plan (the shape materialize_
    # partitioned shuffles and writes), built exactly as run_pipeline
    # does for the fused default
    tri = fused_extract_triples(spark, SF_DIR)
    try:
        from kg.link import link_canonicalize_triples

        final = link_canonicalize_triples(tri, spark)
    except ImportError:  # round-start tree: two-stage chain
        from kg.canonicalize import canonical_map, canonicalize_triples
        from kg.link import alias_dict, link_triples

        final = canonicalize_triples(
            link_triples(tri, alias_dict(spark)), canonical_map(spark)
        )
    sel = final.select("subj_id", "pred", "obj_id", "doc_id", "offset")
    bucketed = with_bucket(sel, 64).withColumn(
        "part_group", F.pmod(F.col("bucket"), F.lit(4)).cast("int")
    )
    n_write = max(spark.sparkContext.defaultParallelism, 2)
    sort_cols = ["bucket", "subj_id", "pred", "obj_id", "doc_id", "offset"]
    if suffix == "before":
        # round-start write shape: range partitioning, explicit width
        shaped = bucketed.repartitionByRange(
            n_write, F.col("part_group"), F.col("bucket"), F.col("subj_id")
        )
    else:
        # current write shape (kg/materialize.py): AQE-flexible REBALANCE
        # on (part_group, bucket)
        shaped = bucketed.hint("rebalance", F.col("part_group"), F.col("bucket"))
    plans["kg_pipeline_write_stage"] = shaped.sortWithinPartitions(
        "part_group", *sort_cols
    )

    for name, df in plans.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_of(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
