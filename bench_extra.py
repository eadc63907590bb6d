"""Round-6 optimization harness: times ONLY the 9 headline bench cells
with bench.py's exact methodology (same session config, warm scan, GC
pause + best-of-2, .count() actions, per-cell steal), so per-change
deltas are measurable in ~2 minutes instead of the full bench's ~8.

Does NOT replace bench.py (frozen for measurement); its numbers are
cited in OPTIMIZATION_r06.md as the iteration evidence and the full
bench.py run is the final before/after authority.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kg.ops import dedup, relational, simsearch  # noqa: E402
from kg.pipeline import run_pipeline  # noqa: E402
from kg.queries import q_top_entities, q_top_entities_fused  # noqa: E402
from kg.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="kg-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    walls_all: dict[str, list[float]] = {}

    def gc_pause():
        spark._jvm.System.gc()
        time.sleep(1)

    def timed_pipeline(name: str, **kw) -> None:
        walls = []
        for _ in range(2):
            gc_pause()
            out_dir = tempfile.mkdtemp(prefix="kg_bx_")
            try:
                t0 = time.time()
                run_pipeline(spark, sf_dir, out_dir, **kw)
                walls.append(round(time.time() - t0, 3))
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
        timings[name] = min(walls)
        walls_all[name] = walls

    def timed(name, fn):
        walls = []
        for _ in range(2):
            gc_pause()
            spark.sparkContext.setJobDescription(name)
            t = time.time()
            fn(spark, sf_dir).count()
            walls.append(round(time.time() - t, 3))
        timings[name] = min(walls)
        walls_all[name] = walls

    timed_pipeline("kg_pipeline_e2e", extractor="fused")
    rep = int(os.environ.get("KG_BENCH_REPLICATE", "64"))
    timed_pipeline("kg_pipeline_e2e_scaled", extractor="fused", replicate=rep)
    timed("kg_top_entities", q_top_entities)
    timed("kg_top_entities_fused", q_top_entities_fused)
    timed("dd_neardup_pairs", dedup.neardup_pairs)
    timed("dd_exact_survivors", dedup.exact_survivors)
    timed("ss_bruteforce_topk", simsearch.bruteforce_topk)
    timed("rel_pricing_summary", relational.pricing_summary)
    timed("rel_revenue_by_nation", relational.revenue_by_nation)

    total = round(sum(timings.values()), 3)
    print(json.dumps({"total": total, "queries": timings, "walls": walls_all}))
    spark.stop()


if __name__ == "__main__":
    main()
