"""DuckDB oracle SQL for every pipeline stage.

Each function returns ANSI-ish SQL runnable by DuckDB over the driver's
registered views (``documents`` etc.) that reproduces the corresponding
Spark stage's exact output — independent re-implementations of the same
declared semantics (kg.vocab + kg.synth derivation), used by the driver's
CORRECTNESS gate and by tests/test_pipeline.py.

The canonicalization oracle uses a pure-Python union-find closure
(kg.vocab.canonical_closure) — independent of the Spark iterative
connected-components implementation it checks.
"""

from __future__ import annotations

from kg.cleaning import sql_clean_text
from kg.ids import py_id64, sql_id64
from kg.synth import SQL_EXPLODED_SPANS, SQL_EXPLODED_SPANS_CLEAN
from kg.vocab import (
    DEFAULT_PRED,
    ENTITY_SURFACES,
    PREDICATES,
    alias_pairs,
    canonical_map_rows,
)


def _in_list(vals: list[str]) -> str:
    return "(" + ", ".join("'" + v + "'" for v in vals) + ")"


def spans_sql() -> str:
    """Raw spans — WITH the planted dirt (kg.synth)."""
    return SQL_EXPLODED_SPANS


def spans_norm_sql() -> str:
    """Stage-0 oracle: the DuckDB lockstep CLEANING CHAIN applied to the
    dirty raw spans (round-3 VERDICT item 2 — previously this row shared
    the raw-spans oracle, valid only on a pre-clean corpus, so the chain's
    semantics were pinned only by pytest). Media spans pass through."""
    cleaned = sql_clean_text("text")
    return f"""
WITH raw_spans AS ({SQL_EXPLODED_SPANS})
SELECT doc_id, kind,
       CASE WHEN kind = 'text' THEN {cleaned} ELSE text END AS text,
       media_ref, "offset"
FROM raw_spans"""


# Token/mention/pair CTE chain shared by extraction-level oracles. Builds
# on the PRISTINE span derivation: each dirt template cleans back to
# exactly the pristine chunk (tests/test_cleaning.py pins this per
# template; the kg_spans_normalize driver row pins it end-to-end through
# the independent DuckDB chain), so tokenizing the pristine text here is
# equivalent to tokenizing clean(dirty) — Spark's side genuinely runs
# dirty -> clean -> extract on every one of these rows.
_TRIPLES_CTE = f"""
WITH spans AS ({SQL_EXPLODED_SPANS_CLEAN}),
tokl AS (
  SELECT doc_id, "offset", list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM spans WHERE kind = 'text'
),
tok AS (
  SELECT doc_id, "offset", unnest(l) AS tok, unnest(range(len(l))) AS p FROM tokl
),
m AS (
  SELECT doc_id, "offset", tok, p,
         lead(tok) OVER w AS obj_tok, lead(p) OVER w AS obj_p
  FROM tok WHERE tok IN {_in_list(ENTITY_SURFACES)}
  WINDOW w AS (PARTITION BY doc_id, "offset" ORDER BY p)
),
pairs AS (SELECT * FROM m WHERE obj_tok IS NOT NULL),
mention_triples AS (
  SELECT pr.doc_id, pr."offset",
         pr.tok AS subj_surface,
         coalesce(arg_min(t2.tok, t2.p), '{DEFAULT_PRED}') AS pred,
         pr.obj_tok AS obj_surface,
         CAST(pr.p AS int) AS subj_pos,
         CAST(pr.obj_p AS int) AS obj_pos
  FROM pairs pr
  LEFT JOIN tok t2
    ON t2.doc_id = pr.doc_id AND t2."offset" = pr."offset"
   AND t2.p > pr.p AND t2.p < pr.obj_p
   AND t2.tok IN {_in_list(PREDICATES)}
  GROUP BY pr.doc_id, pr."offset", pr.tok, pr.obj_tok, pr.p, pr.obj_p
),
media_triples AS (
  SELECT doc_id, "offset",
         doc_id AS subj_surface,
         'has_' || kind AS pred,
         media_ref AS obj_surface,
         CAST(-1 AS int) AS subj_pos,
         CAST(-1 AS int) AS obj_pos
  FROM spans WHERE kind <> 'text'
),
triples_surface AS (
  SELECT * FROM mention_triples UNION ALL SELECT * FROM media_triples
)
"""


def triples_surface_sql() -> str:
    return _TRIPLES_CTE + "SELECT * FROM triples_surface"


def _alias_values() -> str:
    rows = ", ".join(
        f"('{s}', '{t}', {py_id64('ent:' + t)})" for s, t in alias_pairs()
    )
    return f"(VALUES {rows}) AS al(surface, target, target_id)"


def linked_sql() -> str:
    """Stage-2 oracle: one-hop alias linking."""
    return (
        _TRIPLES_CTE
        + f""",
al AS (SELECT * FROM {_alias_values()}),
linked AS (
  SELECT t.doc_id, t."offset",
         CASE WHEN t.subj_pos >= 0
              THEN coalesce(s.target_id, {sql_id64("'ent:' || t.subj_surface")})
              ELSE {sql_id64("'doc:' || t.doc_id")} END AS subj_id,
         CASE WHEN t.subj_pos >= 0 THEN 'concept' ELSE 'document' END AS subj_kind,
         t.pred,
         CASE WHEN t.subj_pos >= 0
              THEN coalesce(o.target_id, {sql_id64("'ent:' || t.obj_surface")})
              ELSE {sql_id64("t.obj_surface")} END AS obj_id,
         CASE WHEN t.subj_pos >= 0 THEN 'concept' ELSE 'media' END AS obj_kind
  FROM triples_surface t
  LEFT JOIN al s ON t.subj_pos >= 0 AND s.surface = t.subj_surface
  LEFT JOIN al o ON t.subj_pos >= 0 AND o.surface = t.obj_surface
)
SELECT * FROM linked"""
    )


def _canon_values() -> str:
    rows = ", ".join(
        f"('{s}', {cid}, '{c}')" for s, c, cid in canonical_map_rows()
    )
    return f"(VALUES {rows}) AS canon(surface, canonical_id, canonical_name)"


def canonical_map_sql() -> str:
    return f"SELECT surface, canonical_id, canonical_name FROM {_canon_values()}"


def edges_sql() -> str:
    """Full-pipeline oracle: canonical (subj_id, pred, obj_id, doc_id, offset)."""
    return (
        _TRIPLES_CTE
        + f""",
canon AS (SELECT * FROM {_canon_values()}),
edges AS (
  SELECT
    CASE WHEN t.subj_pos >= 0 THEN cs.canonical_id
         ELSE {sql_id64("'doc:' || t.doc_id")} END AS subj_id,
    t.pred,
    CASE WHEN t.subj_pos >= 0 THEN co.canonical_id
         ELSE {sql_id64("t.obj_surface")} END AS obj_id,
    t.doc_id, t."offset"
  FROM triples_surface t
  LEFT JOIN canon cs ON t.subj_pos >= 0 AND cs.surface = t.subj_surface
  LEFT JOIN canon co ON t.subj_pos >= 0 AND co.surface = t.obj_surface
)
SELECT * FROM edges"""
    )


def nodes_sql() -> str:
    """Nodes oracle: canonical concepts + doc/media nodes + mention counts."""
    canon_nodes = ", ".join(
        sorted({f"({cid}, '{c}')" for _, c, cid in canonical_map_rows()})
    )
    return (
        edges_sql().replace("SELECT * FROM edges", "")
        + f""",
all_nodes AS (
  SELECT entity_id, name, kind FROM (VALUES {canon_nodes}) v(entity_id, name)
    CROSS JOIN (SELECT 'concept' AS kind)
  UNION ALL
  SELECT DISTINCT {sql_id64("'doc:' || doc_id")}, doc_id, 'document'
  FROM triples_surface WHERE subj_pos < 0
  UNION ALL
  SELECT DISTINCT {sql_id64("obj_surface")}, obj_surface, 'media'
  FROM triples_surface WHERE subj_pos < 0
),
mention_counts AS (
  SELECT entity_id, count(*) AS n_mentions FROM (
    SELECT subj_id AS entity_id FROM edges
    UNION ALL SELECT obj_id FROM edges
  ) GROUP BY entity_id
)
SELECT n.entity_id, n.name, n.kind,
       coalesce(mc.n_mentions, 0) AS n_mentions
FROM all_nodes n LEFT JOIN mention_counts mc USING (entity_id)"""
    )


def top_entities_sql(limit: int = 20) -> str:
    """Flagship analytics oracle: most-mentioned canonical concepts."""
    return (
        edges_sql().replace("SELECT * FROM edges", "")
        + f""",
canon_names AS (
  SELECT DISTINCT canonical_id, canonical_name FROM {_canon_values()}
),
cnt AS (
  SELECT entity_id, count(*) AS n_mentions FROM (
    SELECT subj_id AS entity_id FROM edges
    UNION ALL SELECT obj_id FROM edges
  ) GROUP BY entity_id
)
SELECT cn.canonical_name AS name, c.n_mentions
FROM cnt c JOIN canon_names cn ON cn.canonical_id = c.entity_id
ORDER BY c.n_mentions DESC, name ASC
LIMIT {limit}"""
    )


def similarity_edges_sql(max_distance: int = 3, block_prefix: int = 1) -> str:
    """Oracle for the blocked surface-similarity self-join."""
    return (
        _TRIPLES_CTE
        + f""",
surfaces AS (SELECT DISTINCT tok AS surface FROM tok),
blocked AS (SELECT surface, substr(surface, 1, {block_prefix}) AS blk FROM surfaces)
SELECT a.surface AS src, b.surface AS dst
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.surface < b.surface
WHERE levenshtein(a.surface, b.surface) <= {max_distance}"""
    )


def canonical_map_corpus_sql(max_distance: int = 1, block_prefix: int = 1) -> str:
    """Corpus-similarity canonicalization oracle: the connected-components
    closure expressed as a DuckDB RECURSIVE CTE (reach(x, m) = m is in
    x's component; label = member with min id64)."""
    lbl = sql_id64("m")
    return (
        _TRIPLES_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
        + f""",
surfaces AS (SELECT DISTINCT tok AS surface FROM tok),
blocked AS (SELECT surface, substr(surface, 1, {block_prefix}) AS blk FROM surfaces),
sim AS (
  SELECT a.surface AS src, b.surface AS dst
  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.surface < b.surface
  WHERE levenshtein(a.surface, b.surface) <= {max_distance}
),
sym AS (SELECT src AS a, dst AS b FROM sim UNION SELECT dst, src FROM sim),
reach(node, m) AS (
  SELECT surface, surface FROM surfaces
  UNION
  SELECT s.b, r.m FROM reach r JOIN sym s ON s.a = r.node
),
named AS (
  SELECT node AS surface, arg_min(m, {lbl}) AS canonical_name
  FROM reach GROUP BY node
)
SELECT surface, {sql_id64("'ent:' || canonical_name")} AS canonical_id,
       canonical_name
FROM named"""
    )


def degree_hist_sql() -> str:
    """Out-degree distribution over the canonical edges."""
    return (
        edges_sql().replace("SELECT * FROM edges", "")
        + """,
deg AS (SELECT subj_id, count(*) AS out_degree FROM edges GROUP BY subj_id)
SELECT out_degree, count(*) AS n_nodes FROM deg GROUP BY out_degree"""
    )


def two_hop_sql() -> str:
    """Distinct 2-hop (a,b,c) chains over concept-concept edges."""
    return (
        edges_sql().replace("SELECT * FROM edges", "")
        + """,
cpairs AS (
  SELECT DISTINCT subj_id, obj_id FROM edges WHERE pred NOT LIKE 'has_%'
)
SELECT DISTINCT p1.subj_id AS a, p1.obj_id AS b, p2.obj_id AS c
FROM cpairs p1 JOIN cpairs p2 ON p1.obj_id = p2.subj_id"""
    )


def pred_hist_sql() -> str:
    return (
        _TRIPLES_CTE
        + "SELECT pred, count(*) AS n FROM triples_surface GROUP BY pred"
    )


def doc_media_sql() -> str:
    """Per-document media span counts by kind."""
    return f"""
WITH spans AS ({SQL_EXPLODED_SPANS})
SELECT doc_id, kind, count(*) AS n_spans
FROM spans WHERE kind <> 'text'
GROUP BY doc_id, kind"""
