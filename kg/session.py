"""SparkSession factory.

Single place that configures the session the whole engine assumes:
AQE on (skew-join backstop), Arrow on (vectorized pandas UDFs), explicit
shuffle parallelism scaled to cores. Reference analog: the hand-rolled
multiprocessing pool setup in
``data/scripts/data_processor_optimized.py:169-196`` — Spark replaces it
with executor parallelism, so all tuning lives here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spread_partitions(spark: SparkSession) -> int:
    """Partition count for spreading a SMALL scan before a CPU-dense
    Arrow kernel (kg.fused / kg.synth / kg.ops.dedup parallelism guards).

    1x session cores — not the 2x-cores shuffle-partition default: the
    2x headroom exists so skewed SHUFFLE stages keep every core busy
    around a straggler, but the kernel spread feeds uniform-by-
    construction batches, and every extra task pays serial scheduler
    dispatch plus a Python-worker round-trip (measured at sf0.1 on 32
    cores: fused kernel 0.70 s at 64 tasks vs 0.41 s at 32; x64 tiling
    1.48 vs 1.31). Reads the core count get_spark stores in conf
    (``spark.kg.cores``); sessions not built by that factory fall back
    to ``defaultParallelism``, which preserves the old behavior."""
    v = spark.conf.get("spark.kg.cores", None)
    if v:
        return int(v)
    return spark.sparkContext.defaultParallelism


def get_spark(
    app: str = "kg",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cores=None`` -> ``local[*]``. ``shuffle_partitions`` defaults to
    2x cores so every core has work even with one straggler, without
    creating thousands of tiny tasks at test scale. On a real cluster the
    same knobs come from spark-submit conf; this function only fills
    local-mode defaults.
    """
    env_cores = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and env_cores:
        cores = int(env_cores)
    master = (
        master
        or os.environ.get("KG_MASTER")
        or (f"local[{cores}]" if cores else "local[*]")
    )
    is_cluster = not master.startswith("local")
    n_shuffle = shuffle_partitions or max(8, 2 * (cores or (os.cpu_count() or 8)))

    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.default.parallelism", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m coalesces a ~1GB shuffle to ~16 tasks — too coarse to
        # keep 32 cores busy on CPU-heavy post-shuffle stages (sort/encode).
        # r06: 4m (was 16m) — the staged parquet write is CPU-dense per
        # shuffled byte (sort + dictionary encode + zstd), so the byte-based
        # advisory must sit low for the write stage to keep enough tasks
        # once coalescing is real (parallelismFirst=false below; measured
        # at sf0.1 x64: write stage 6.5 s at 16m/20 tasks vs 5.2 s at
        # 4m/~40 tasks, while tiny-input stages still collapse to 1 task
        # either way). Env-overridable for cluster runs where shuffles are
        # IO-bound and larger partitions win (guide §9 suggests 256m there).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("KG_ADVISORY_PARTITION", "4m"),
        )
        # r06: actually COALESCE BY SIZE. Spark's default parallelismFirst
        # =true ignores the advisory size and keeps ~default-parallelism
        # reduce tasks, so every small aggregation paid ~2x cores worth of
        # near-empty task dispatches (~10 ms each in local mode; measured
        # 1.40 s -> 0.35 s on a 184k-row explode+groupBy). Size-based
        # coalescing is the scale-adaptive behavior the guide prescribes
        # (§2.2): tiny inputs collapse to few tasks, 100 TB inputs keep
        # full width, and explicit repartition(n, ...) stages (the
        # CPU-heavy staged writes) are never coalesced by AQE.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # consumed by spread_partitions() (kernel parallelism guards)
        .config("spark.kg.cores", str(cores or (os.cpu_count() or 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("KG_WAREHOUSE", "/tmp/kg-warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # heap scales with cores (a real cluster brings ~1-2 GB/core with
        # every executor): an undersized shared heap turns concurrent task
        # allocation into a GC bottleneck that erases multi-core scaling
        .config(
            "spark.driver.memory",
            os.environ.get(
                "KG_DRIVER_MEM",
                "4g" if is_cluster else f"{max(6, int(1.5 * (cores or 8)))}g",
            ),
        )
    )
    if is_cluster:
        # standalone mode: fixed-shape executors (one JVM per 8-core slice);
        # `cores` becomes the total-core cap = executor count x 8
        b = (
            b.config("spark.executor.cores", os.environ.get("KG_EXECUTOR_CORES", "8"))
            .config("spark.executor.memory", os.environ.get("KG_EXECUTOR_MEM", "12g"))
            .config("spark.cores.max", str(cores or 8))
        )
    # Iceberg routing (north rule: Iceberg tables): configured iff the
    # runtime jar is present — a no-op probe otherwise (kg/iceberg.py)
    from kg.iceberg import configure_builder

    b = configure_builder(b, os.environ.get("KG_WAREHOUSE", "/tmp/kg-warehouse"))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
