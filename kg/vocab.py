"""Fixed extraction/linking vocabulary — the engine's "model".

The reference's extraction slot is a sentence-transformer encoder
(``embed/embedding_generator.py:126-166``); our KG target replaces it with
a deterministic dictionary extractor so precision/recall against an oracle
is exactly testable. The vocabulary is closed over the synthetic corpus
word pool (31 distinct tokens in /root/testdata documents).

Alias edges intentionally form multi-hop chains (line->row->record,
part->group->segment) so canonicalization genuinely needs transitive
closure (connected components), not a single dictionary lookup.
"""

from __future__ import annotations

from kg.ids import py_id64

# Tokens that count as entity mentions (subjects/objects of triples).
ENTITY_SURFACES: list[str] = [
    "table", "column", "row", "line", "key", "value", "query", "window",
    "vector", "stream", "batch", "customer", "group", "part", "data",
    "hash", "spark",
]

# Tokens that, appearing between two mentions, become the triple predicate.
PREDICATES: list[str] = ["scan", "sort", "merge", "join", "filter", "agg", "order"]

# Default predicate when no predicate token separates two mentions.
DEFAULT_PRED = "near"

# One-hop alias edges (surface -> target surface). Targets may themselves
# be aliased (chains), and "record"/"segment" are canonical-only forms that
# never appear in text. Everything not listed aliases to itself.
ALIAS_EDGES: dict[str, str] = {
    "line": "row",
    "row": "record",
    "part": "group",
    "group": "segment",
}

ENTITY_KIND = "concept"


def alias_pairs() -> list[tuple[str, str]]:
    """All (surface, target) pairs including identity for catalog surfaces."""
    surfaces = set(ENTITY_SURFACES) | set(ALIAS_EDGES.values())
    return sorted((s, ALIAS_EDGES.get(s, s)) for s in surfaces)


def canonical_closure() -> dict[str, str]:
    """Transitive closure of ALIAS_EDGES: surface -> canonical surface.

    The canonical member of each connected component is the member with
    the smallest :func:`kg.ids.py_id64` — the same deterministic rule the
    Spark connected-components stage applies, so this pure-Python closure
    is the oracle for stage 3.
    """
    surfaces = set(ENTITY_SURFACES) | set(ALIAS_EDGES) | set(ALIAS_EDGES.values())
    # union-find over alias edges
    parent = {s: s for s in surfaces}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in ALIAS_EDGES.items():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[str, list[str]] = {}
    for s in surfaces:
        comps.setdefault(find(s), []).append(s)
    out: dict[str, str] = {}
    for members in comps.values():
        canon = min(members, key=lambda m: (py_id64(m), m))
        for m in members:
            out[m] = canon
    return out


def canonical_map_rows() -> list[tuple[str, str, int]]:
    """(surface, canonical_name, canonical_id) rows — oracle fixture."""
    cc = canonical_closure()
    return sorted((s, c, py_id64("ent:" + c)) for s, c in cc.items())
