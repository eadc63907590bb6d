"""Fused Arrow extraction: flat documents -> surface triples in ONE
mapInPandas kernel (derive spans + normalize + extract per batch).

Why this exists: the stage-by-stage JVM path (array HOFs + explode) is
allocation-bound — interpreted higher-order expressions generate so much
garbage that wall time stops improving with executor threads (measured:
local[2] ≈ local[32] on the explode stage, java at 640%% CPU from GC).
Python workers are separate *processes*, so the fused kernel scales with
cores and is also faster in absolute terms. It implements exactly the
semantics declared in kg.synth (span derivation) + kg.cleaning +
kg.extract (mention/pair/predicate rules); tests assert equality against
the unfused path and the DuckDB oracle.

This is the architecture the north rule prescribes ("exploded span
sequences flow through vectorized pandas/Arrow UDFs for batched mention
detection and relation extraction") — batch in, batch out, heavyweight
state (the vocab dictionaries) loaded once per worker.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os
import zlib

from kg.cleaning import clean_text_pandas
from kg.schemas import TRIPLES_SURFACE
from kg.synth import (
    MEDIA_EVERY,
    MEDIA_KINDS,
    REPLICA_STRIDE,
    WORDS_PER_SPAN,
    plant_dirt_py,
)
from kg.vocab import DEFAULT_PRED, ENTITY_SURFACES, PREDICATES

_ENT = frozenset(ENTITY_SURFACES)
_PRED = frozenset(PREDICATES)

# Simulated extractor weight (KG_EXTRACTOR_COST=N): N extra crc32 passes
# over each text span before extraction. The dictionary extractor used for
# oracle-exact testing is ~100x lighter than the model the north star puts
# in this slot (the reference's is a sentence-transformer at ~340 texts/s,
# embed/README.md:125-131); the scaling bench can dial realistic per-span
# compute back in WITHOUT changing any output. Default 0 = off.
_EXTRACTOR_COST = int(os.environ.get("KG_EXTRACTOR_COST", "0"))


def _simulated_model_cost(chunk: str) -> None:
    acc = 0
    data = chunk.encode()
    for i in range(_EXTRACTOR_COST):
        acc = zlib.crc32(data, acc)


def _maybe_inject_failure() -> None:
    """Task-failure drill hook (reference Gate C analog: ``project
    idea.pdf`` p.6 — kill one query node mid-query, recover <10 s).
    When env ``KG_FAIL_TASK_ONCE`` is set, the FIRST attempt of partition
    0 raises, so under ``spark.task.maxFailures>1`` (master
    ``local[N,2]``) Spark retries exactly that task and the job still
    succeeds with byte-identical output — Spark's task-retry machinery is
    the engine's recovery story, and this hook lets a test prove it fires
    on the hot path instead of assuming it. The env var must be set
    before the JVM boots (python workers inherit it), hence the
    subprocess drill in ``scripts/failure_drill.py``. No-op (one dict
    lookup) outside the drill."""
    if not os.environ.get("KG_FAIL_TASK_ONCE"):
        return
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError(
            "KG_FAIL_TASK_ONCE: injected task failure (drill, attempt 0)"
        )


def _extract_span(
    out: dict, doc_id_str: str, offset: int, toks: list[str]
) -> None:
    """Mention-pair triples for one cleaned text span (kg.extract rules)."""
    ment = [p for p, w in enumerate(toks) if w in _ENT]
    for p1, p2 in zip(ment, ment[1:]):
        pred = next(
            (toks[q] for q in range(p1 + 1, p2) if toks[q] in _PRED),
            DEFAULT_PRED,
        )
        out["doc_id"].append(doc_id_str)
        out["offset"].append(offset)
        out["subj_surface"].append(toks[p1])
        out["pred"].append(pred)
        out["obj_surface"].append(toks[p2])
        out["subj_pos"].append(p1)
        out["obj_pos"].append(p2)


def fused_extract_triples(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """Flat documents parquet -> TRIPLES_SURFACE via one Arrow kernel."""
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("_rep"))
        flat = flat.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_rep") * REPLICA_STRIDE).alias("doc_id"),
            "text",
        )
    # Parallelism guard: a small input (or a crossJoin that inherits one
    # scan partition) must be spread across the workers before the Python
    # kernel. Decide from driver-side file sizes — probing
    # flat.rdd.getNumPartitions() costs a ~1.3 s plan->RDD conversion per
    # session. At real scale (total bytes >> threshold) the scan already
    # has plenty of splits and no shuffle is added.
    import os

    target = spark.sparkContext.defaultParallelism
    try:
        total_bytes = sum(
            os.path.getsize(p.removeprefix("file:"))
            for p in flat.inputFiles()
        )
    except OSError:  # non-local paths: fall back to the safe repartition
        total_bytes = 0
    if total_bytes < 1 << 30:
        flat = flat.repartition(target)

    return flat.mapInPandas(_run_batches, schema=TRIPLES_SURFACE)


def _run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The fused kernel: (doc_id:int64, text) batches -> TRIPLES_SURFACE
    batches. Module-level so batch (fused_extract_triples) and streaming
    (kg.streaming.stream_extract_triples) share it verbatim."""
    _maybe_inject_failure()
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in TRIPLES_SURFACE.fieldNames()}
        # pass 1: derive spans from RAW words (kg.synth contract);
        # collect text-span chunks for one vectorized cleaning pass
        text_spans: list[tuple[str, int, str]] = []  # (doc_id, offset, chunk)
        for doc_num, text in zip(pdf["doc_id"], pdf["text"]):
            doc_num = int(doc_num)
            doc_id_str = f"doc-{doc_num:07d}"
            words = [w for w in text.split(" ") if w]
            n_spans = (len(words) + WORDS_PER_SPAN - 1) // WORDS_PER_SPAN
            for i in range(n_spans):
                if (doc_num + i) % MEDIA_EVERY == 0:
                    kind = MEDIA_KINDS[(doc_num + i) % 3]
                    out["doc_id"].append(doc_id_str)
                    out["offset"].append(i)
                    out["subj_surface"].append(doc_id_str)
                    out["pred"].append("has_" + kind)
                    out["obj_surface"].append(f"media://{kind}/{doc_num}-{i}")
                    out["subj_pos"].append(-1)
                    out["obj_pos"].append(-1)
                else:
                    chunk = " ".join(
                        words[i * WORDS_PER_SPAN : (i + 1) * WORDS_PER_SPAN]
                    )
                    # the raw span carries the planted dirt (kg.synth
                    # contract); pass 2's vectorized clean removes it
                    text_spans.append(
                        (doc_id_str, i, plant_dirt_py(doc_num, i, chunk))
                    )
        # pass 2: vectorized normalize (stage-0 kernel), then extract
        if text_spans:
            cleaned = clean_text_pandas(
                pd.Series([c for _, _, c in text_spans])
            )
            for (doc_id_str, i, _), ctext in zip(text_spans, cleaned):
                if _EXTRACTOR_COST:
                    _simulated_model_cost(ctext)
                toks = [w for w in ctext.split(" ") if w]
                _extract_span(out, doc_id_str, i, toks)
        res = pd.DataFrame(out)
        res["offset"] = res["offset"].astype("int32")
        res["subj_pos"] = res["subj_pos"].astype("int32")
        res["obj_pos"] = res["obj_pos"].astype("int32")
        yield res

