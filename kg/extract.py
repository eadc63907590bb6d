"""Stage 1 — triple extraction (mention detection + relation extraction).

Semantics (deterministic dictionary "model" — see kg.vocab):
* tokens  = non-empty whitespace split of a normalized text span;
* mention = token in ENTITY_SURFACES, at 0-based position ``p``;
* for every pair of *consecutive* mentions (p1 < p2) the triple is
  ``(subj=tok[p1], pred, obj=tok[p2])`` where ``pred`` is the first
  PREDICATES token strictly between p1 and p2, else ``near``;
* every media span emits ``(doc_id, has_<kind>, media_ref)``.

Two interchangeable implementations, asserted equal in tests:

* :func:`extract_triples` — pure native array higher-order functions
  (filter/transform/zip_with/slice). Zero shuffle, whole-stage codegen;
  at 100 TB this is a narrow map over the scan.
* :func:`extract_triples_pandas` — Arrow-batched ``mapInPandas`` kernel:
  the slot where a real extraction model would sit (reference analog: the
  batched sentence-transformer encode, ``embed/embedding_generator.py:126-166``
  — model loaded once per worker, batch in, batch out; no per-row Python UDF).
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg.schemas import TRIPLES_SURFACE
from kg.vocab import DEFAULT_PRED, ENTITY_SURFACES, PREDICATES

def _ent_arr() -> Column:
    return F.array(*[F.lit(w) for w in ENTITY_SURFACES])


def _pred_arr() -> Column:
    return F.array(*[F.lit(w) for w in PREDICATES])


def _mention_pairs(toks: Column) -> Column:
    """array<struct<subj,pred,obj,subj_pos,obj_pos>> from a token array."""
    ents = _ent_arr()
    n_tok = F.size(toks)
    positions = F.when(n_tok > 0, F.sequence(F.lit(0), n_tok - 1)).otherwise(
        F.array().cast("array<int>")
    )
    ment = F.filter(
        positions, lambda i: F.array_contains(ents, F.element_at(toks, i + 1))
    )
    n = F.size(ment)
    pair_pos = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ment, 1, n - 1),
            F.slice(ment, 2, n - 1),
            lambda p1, p2: F.struct(p1.alias("p1"), p2.alias("p2")),
        ),
    ).otherwise(F.array().cast("array<struct<p1:int,p2:int>>"))
    return F.transform(pair_pos, lambda pp: _pair_to_triple(toks, pp))


def _pair_to_triple(toks: Column, pp: Column) -> Column:
    p1, p2 = pp["p1"], pp["p2"]
    between = F.when(p2 > p1 + 1, F.sequence(p1 + 1, p2 - 1)).otherwise(
        F.array().cast("array<int>")
    )
    preds = _pred_arr()
    pred_positions = F.filter(
        between, lambda q: F.array_contains(preds, F.element_at(toks, q + 1))
    )
    pred = F.coalesce(
        F.try_element_at(
            F.transform(pred_positions, lambda q: F.element_at(toks, q + 1)), F.lit(1)
        ),
        F.lit(DEFAULT_PRED),
    )
    return F.struct(
        F.element_at(toks, p1 + 1).alias("subj_surface"),
        pred.alias("pred"),
        F.element_at(toks, p2 + 1).alias("obj_surface"),
        p1.cast("int").alias("subj_pos"),
        p2.cast("int").alias("obj_pos"),
    )


def extract_triples(spans_norm: DataFrame) -> DataFrame:
    """Native-HOF extraction over stage-0 output. Returns TRIPLES_SURFACE.

    Tokens are materialized as a column (one split per row) BEFORE the
    higher-order functions: passing the raw split expression into the
    lambdas would inline it at every element_at reference — O(tokens²)
    recomputation of the split (and of the upstream cleaning chain) per
    span.
    """
    text = spans_norm.filter(F.col("kind") == "text")
    toks_expr = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    with_toks = text.select("doc_id", "offset", toks_expr.alias("_toks"))
    mention = (
        with_toks.select(
            "doc_id", "offset", _mention_pairs(F.col("_toks")).alias("pairs")
        )
        .select("doc_id", "offset", F.explode("pairs").alias("t"))
        .select(
            "doc_id",
            "offset",
            "t.subj_surface",
            "t.pred",
            "t.obj_surface",
            "t.subj_pos",
            "t.obj_pos",
        )
    )
    media = spans_norm.filter(F.col("kind") != "text").select(
        "doc_id",
        "offset",
        F.col("doc_id").alias("subj_surface"),
        F.concat(F.lit("has_"), F.col("kind")).alias("pred"),
        F.col("media_ref").alias("obj_surface"),
        F.lit(-1).cast("int").alias("subj_pos"),
        F.lit(-1).cast("int").alias("obj_pos"),
    )
    return mention.unionByName(media)


# ---------------------------------------------------------------------------
# Arrow-batched extractor (the "model inference" slot)
# ---------------------------------------------------------------------------

_ENT_SET = frozenset(ENTITY_SURFACES)
_PRED_SET = frozenset(PREDICATES)


def _extract_batch(doc_ids: List[str], offsets: List[int], texts: List[str]) -> pd.DataFrame:
    """Batched extraction kernel — same semantics as the HOF path."""
    out: dict[str, list] = {k: [] for k in TRIPLES_SURFACE.fieldNames()}
    for doc_id, offset, txt in zip(doc_ids, offsets, texts):
        toks = [w for w in txt.split(" ") if w]
        ment = [i for i, w in enumerate(toks) if w in _ENT_SET]
        for p1, p2 in zip(ment, ment[1:]):
            pred = next((toks[q] for q in range(p1 + 1, p2) if toks[q] in _PRED_SET),
                        DEFAULT_PRED)
            out["doc_id"].append(doc_id)
            out["offset"].append(offset)
            out["subj_surface"].append(toks[p1])
            out["pred"].append(pred)
            out["obj_surface"].append(toks[p2])
            out["subj_pos"].append(p1)
            out["obj_pos"].append(p2)
    return pd.DataFrame(out)


def extract_triples_pandas(spans_norm: DataFrame) -> DataFrame:
    """mapInPandas extraction (Arrow batches; model-slot variant)."""
    text = spans_norm.filter(F.col("kind") == "text").select("doc_id", "offset", "text")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # A heavyweight extractor would be loaded once here, per worker
        # (reference: embed/embedding_generator.py:83-124 load_model).
        for pdf in batches:
            yield _extract_batch(
                pdf["doc_id"].tolist(), pdf["offset"].tolist(), pdf["text"].tolist()
            )

    mention = text.mapInPandas(_run, schema=TRIPLES_SURFACE)
    media = spans_norm.filter(F.col("kind") != "text").select(
        "doc_id",
        "offset",
        F.col("doc_id").alias("subj_surface"),
        F.concat(F.lit("has_"), F.col("kind")).alias("pred"),
        F.col("media_ref").alias("obj_surface"),
        F.lit(-1).cast("int").alias("subj_pos"),
        F.lit(-1).cast("int").alias("obj_pos"),
    )
    return mention.unionByName(media)
