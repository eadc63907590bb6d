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


def fused_extract_triples(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """Flat documents parquet -> TRIPLES_SURFACE via one Arrow kernel."""
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # Parallelism guard: a small input must be spread across the workers
    # before the Python kernel (with kernel-side tiling below, each of
    # the `replicate` copies of a partition's docs is processed by that
    # partition's worker, so the guard also sets the tiled parallelism).
    # Decide from driver-side file sizes — probing
    # flat.rdd.getNumPartitions() costs a ~1.3 s plan->RDD conversion
    # per session. At real scale (total bytes >> threshold) the scan
    # already has plenty of splits and no shuffle is added.
    import os

    from kg.session import spread_partitions

    target = spread_partitions(spark)
    try:
        total_bytes = sum(
            os.path.getsize(p.removeprefix("file:"))
            for p in flat.inputFiles()
        )
    except OSError:  # non-local paths: fall back to the safe repartition
        total_bytes = 0
    if total_bytes < 1 << 30:
        flat = flat.repartition(target)
    if replicate > 1:
        # r06: tile INSIDE the kernel — the JVM crossJoin shipped
        # `replicate` identical copies of every document through the
        # Python boundary (guide §4.1: you control how many bytes
        # cross). Each replica is still derived, dirtied, cleaned and
        # extracted independently (replica r shifts doc ids, which
        # shifts the planted-dirt selector), so the compute is
        # unchanged — only the duplicated text transfer is gone.
        def _tiled(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            return _run_batches(batches, replicate=replicate)

        return flat.mapInPandas(_tiled, schema=TRIPLES_SURFACE)

    return flat.mapInPandas(_run_batches, schema=TRIPLES_SURFACE)


def _split_nonempty(texts):
    """Vectorized ``[w for w in t.split(' ') if w]`` over a string column:
    one RE2-free Arrow split, then empty tokens dropped by offset
    arithmetic. Returns (tokens: np.ndarray[object], tokens_arrow: the
    same values as an Arrow array — kept for hash-based pc.is_in, far
    faster than sort-based np.isin on object dtype —, starts: int64
    per-row first-token index, counts: int64 per-row token count)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string(), from_pandas=True)
    split = pc.split_pattern(arr, " ")
    words = pc.list_flatten(split)
    row_len = np.asarray(pc.list_value_length(split).cast(pa.int64()))
    starts_all = np.concatenate(([0], np.cumsum(row_len)))
    keep_arrow = pc.not_equal(words, "")
    keep = np.asarray(keep_arrow.to_numpy(zero_copy_only=False), dtype=bool)
    kcum = np.concatenate(([0], np.cumsum(keep)))
    counts = kcum[starts_all[1:]] - kcum[starts_all[:-1]]
    kept_arrow = words.filter(keep_arrow)
    tokens = kept_arrow.to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    return tokens, kept_arrow, starts, counts


def _run_batches(
    batches: Iterator[pd.DataFrame], replicate: int = 1
) -> Iterator[pd.DataFrame]:
    """The fused kernel: (doc_id:int64, text) batches -> TRIPLES_SURFACE
    batches. Module-level so batch (fused_extract_triples) and streaming
    (kg.streaming.stream_extract_triples) share it verbatim.

    r06: pass 1 (span derivation) and pass 3 (mention-pair extraction)
    are numpy/Arrow-vectorized — the previous per-doc/per-token Python
    loops were ~half the kernel after the cleaning pass went Arrow
    (guide §4.2: batch work belongs in vectorized native libraries).
    Semantics are unchanged and pinned by tests/test_fused.py (fused ==
    native HOF path == DuckDB oracle, row-for-row).

    ``replicate`` tiles each batch kernel-side (replica r = doc ids
    shifted by r*REPLICA_STRIDE, processed independently and in full) —
    see fused_extract_triples for why the tiling moved off the JVM."""
    import numpy as np

    _maybe_inject_failure()
    for base_pdf in batches:
        pdf = base_pdf
        if replicate > 1:
            # tile as ONE frame (np.tile copies string POINTERS, not
            # bytes) so the kernel keeps full-batch vectorization —
            # looping `replicate` small kernel calls per batch paid the
            # per-invocation Arrow/numpy fixed cost 64x and measured
            # slower than the crossJoin it replaced
            nums = base_pdf["doc_id"].to_numpy(dtype="int64")
            shift = np.repeat(
                np.arange(replicate, dtype="int64") * REPLICA_STRIDE,
                len(nums),
            )
            pdf = pd.DataFrame(
                {
                    "doc_id": np.tile(nums, replicate) + shift,
                    "text": np.tile(
                        base_pdf["text"].to_numpy(dtype=object), replicate
                    ),
                }
            )
        yield _one_batch(pdf, np)


def _one_batch(pdf: pd.DataFrame, np) -> pd.DataFrame:
    """One (doc_id:int64, text) frame -> one TRIPLES_SURFACE frame
    (the vectorized kernel body; see _run_batches)."""
    doc_nums = pdf["doc_id"].to_numpy(dtype="int64")
    doc_ids = np.array(
        ["doc-%07d" % n for n in doc_nums], dtype=object
    )
    tokens, _tok_arrow, tok_start, tok_count = _split_nonempty(pdf["text"])

    # span table: doc index + span offset per span (kg.synth contract)
    n_spans = (tok_count + WORDS_PER_SPAN - 1) // WORDS_PER_SPAN
    total = int(n_spans.sum())
    doc_idx = np.repeat(np.arange(len(doc_nums)), n_spans)
    span_i = np.arange(total) - np.repeat(
        np.cumsum(n_spans) - n_spans, n_spans
    )
    s_key = doc_nums[doc_idx] + span_i
    is_media = (s_key % MEDIA_EVERY) == 0

    # media rows (pass 1 output)
    m_doc = doc_idx[is_media]
    m_key = s_key[is_media]
    kinds = np.array(MEDIA_KINDS, dtype=object)[m_key % 3]
    m_nums = doc_nums[m_doc]
    m_off = span_i[is_media]
    media = {
        "doc_id": doc_ids[m_doc],
        "offset": m_off,
        "subj_surface": doc_ids[m_doc],
        "pred": np.array(
            ["has_" + k for k in kinds], dtype=object
        ),
        "obj_surface": np.array(
            [
                f"media://{k}/{n}-{i}"
                for k, n, i in zip(kinds, m_nums, m_off)
            ],
            dtype=object,
        ),
        "subj_pos": np.full(len(m_doc), -1, dtype="int64"),
        "obj_pos": np.full(len(m_doc), -1, dtype="int64"),
    }

    # text spans: raw chunks carry the planted dirt (kg.synth contract)
    t_doc = doc_idx[~is_media]
    t_i = span_i[~is_media]
    tok_list = tokens.tolist()  # list slicing is ~2x numpy fancy-index
    a = (tok_start[t_doc] + t_i * WORDS_PER_SPAN).tolist()
    b = np.minimum(
        tok_start[t_doc] + (t_i + 1) * WORDS_PER_SPAN,
        tok_start[t_doc] + tok_count[t_doc],
    ).tolist()
    t_nums = doc_nums[t_doc].tolist()
    t_is = t_i.tolist()
    chunks = [
        plant_dirt_py(n, i, " ".join(tok_list[lo:hi]))
        for n, i, lo, hi in zip(t_nums, t_is, a, b)
    ]

    # pass 2: vectorized normalize (stage-0 Arrow kernel)
    cleaned = clean_text_pandas(pd.Series(chunks, dtype=object))
    if _EXTRACTOR_COST:
        for ctext in cleaned:
            _simulated_model_cost(ctext)

    # pass 3: vectorized mention-pair extraction (kg.extract rules)
    ctok, ctok_arrow, c_start, c_count = _split_nonempty(cleaned)
    c_off = np.concatenate((c_start, [c_start[-1] + c_count[-1]])) if len(
        c_start
    ) else np.zeros(1, dtype="int64")
    import pyarrow as pa
    import pyarrow.compute as pc

    is_ent = np.asarray(
        pc.is_in(ctok_arrow, value_set=pa.array(sorted(_ENT)))
        .to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    is_pred = np.asarray(
        pc.is_in(ctok_arrow, value_set=pa.array(sorted(_PRED)))
        .to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    ment = np.flatnonzero(is_ent)
    span_of = np.searchsorted(c_off, ment, side="right") - 1
    valid = span_of[:-1] == span_of[1:] if len(ment) else np.zeros(0, bool)
    g1 = ment[:-1][valid]
    g2 = ment[1:][valid]
    sp = span_of[:-1][valid]
    pidx = np.flatnonzero(is_pred)
    if len(pidx):
        j = np.searchsorted(pidx, g1 + 1, side="left")
        jc = np.minimum(j, len(pidx) - 1)
        has = (j < len(pidx)) & (pidx[jc] < g2)
        preds = np.where(has, ctok[pidx[jc]], DEFAULT_PRED)
    else:
        preds = np.full(len(g1), DEFAULT_PRED, dtype=object)
    triples = {
        "doc_id": doc_ids[t_doc[sp]],
        "offset": t_i[sp],
        "subj_surface": ctok[g1],
        "pred": preds,
        "obj_surface": ctok[g2],
        "subj_pos": g1 - c_off[sp],
        "obj_pos": g2 - c_off[sp],
    }

    res = pd.DataFrame(
        {
            k: np.concatenate((media[k], triples[k]))
            for k in TRIPLES_SURFACE.fieldNames()
        }
    )
    res["offset"] = res["offset"].astype("int32")
    res["subj_pos"] = res["subj_pos"].astype("int32")
    res["obj_pos"] = res["obj_pos"].astype("int32")
    return res

