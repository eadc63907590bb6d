"""Stage 3 — canonicalization: connected components + canonical IDs.

Surface forms that alias each other (possibly through multi-hop chains,
e.g. line -> row -> record) must collapse to one canonical entity. We run
label propagation over the surface-similarity graph as an iterative
DataFrame self-join: every node starts with label = id64(node); each
round a node takes the min label among itself and its neighbors; converged
when no label changes. The component's canonical id is therefore
min(id64(member)) — deterministic (SURVEY §7.4.1; the reference's
Python-hash landmine, ``data/scripts/data_processor.py:84,95``).

Scale notes (north rule: "iterative DataFrame self-join with
large-component capping"):
* each iteration is one shuffle on the node key; ``localCheckpoint``
  truncates the lineage so plans don't grow with iterations;
* giant components (stop-word-like aliases) are capped: components larger
  than ``max_component`` revert to singleton labels, bounding both the
  join fan-out and downstream skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kg.ids import id64
from kg.vocab import alias_pairs


DRIVER_CC_MAX_EDGES = 100_000


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    max_component: int | None = None,
    n_partitions: int | None = None,
    driver_fastpath_edges: int | None = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """(src:string, dst:string) undirected edges -> (node, label).

    ``label`` = min id64 over the node's component. Pure driver-side loop
    over stock operators (Catalyst can't express iteration; SURVEY §4.3).

    ``n_partitions`` sizes every shuffle in the loop: pass a small number
    for small graphs (avoids scheduling hundreds of empty tasks per
    iteration) and scale it with edge count on a cluster.

    Small-graph fast path: when the edge list fits comfortably on the
    driver (``count <= driver_fastpath_edges``), the iterative job loop
    costs far more in scheduling than the union-find costs in Python, so
    the closure is computed driver-side and returned as a literal
    DataFrame — same result, ~20x less wall (pass ``None`` to force the
    distributed loop; the big-graph path is what runs on a real
    similarity graph).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if driver_fastpath_edges is not None:
        sample = sym.limit(driver_fastpath_edges + 1).collect()
        if len(sample) <= driver_fastpath_edges:
            return _driver_cc(
                edges.sparkSession, [(r.a, r.b) for r in sample], max_component
            )
    if n_partitions:
        sym = sym.repartition(n_partitions, "a")
    nodes = (
        sym.select(F.col("a").alias("node"))
        .unionByName(sym.select(F.col("b").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", id64(F.col("node"))).localCheckpoint()
    sym = sym.localCheckpoint()

    if n_partitions:
        labels = labels.repartition(n_partitions, "node")

    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nb_label"))
        )
        if n_partitions:
            neighbor_min = neighbor_min.repartition(n_partitions, "node")
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nb_label", F.col("label"))).alias(
                    "label"
                ),
                (F.col("nb_label") < F.col("label")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        # silent non-convergence yields wrong-but-plausible canonical ids
        # for components whose propagation radius exceeds max_iter
        import warnings

        warnings.warn(
            f"connected_components: label propagation still changing after "
            f"max_iter={max_iter} iterations; labels for components with "
            f"propagation radius > {max_iter} are NOT canonical. Raise "
            f"max_iter (or cap component sizes).",
            RuntimeWarning,
            stacklevel=2,
        )

    if max_component is not None:
        sizes = labels.groupBy("label").agg(F.count("*").alias("_sz"))
        labels = (
            labels.join(F.broadcast(sizes.filter(F.col("_sz") > max_component)), "label", "left_anti")
            .unionByName(
                labels.join(
                    F.broadcast(sizes.filter(F.col("_sz") > max_component)), "label"
                ).select("node", id64(F.col("node")).alias("label"))
            )
        )
    return labels


def _driver_cc_rows(
    sym_pairs: list[tuple[str, str]], max_component: int | None
) -> list[tuple[str, int]]:
    """Union-find closure on the driver; same (node, label) contract as the
    distributed loop (label = min id64 over the component, capped
    components revert to singletons)."""
    from kg.ids import py_id64

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sym_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[str, list[str]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    rows: list[tuple[str, int]] = []
    for members in comps.values():
        if max_component is not None and len(members) > max_component:
            rows.extend((m, py_id64(m)) for m in members)
        else:
            label = min(py_id64(m) for m in members)
            rows.extend((m, label) for m in members)
    return sorted(rows)


def _driver_cc(
    spark: SparkSession, sym_pairs: list[tuple[str, str]], max_component: int | None
) -> DataFrame:
    return spark.createDataFrame(
        _driver_cc_rows(sym_pairs, max_component), "node string, label long"
    )


# keyed by max_component: the rows derive ONLY from the static alias
# dictionary + that cap — session-independent, so no id(spark) key that a
# GC'd session's reused address could poison (round-3 ADVICE item 3)
_CANON_CACHE: dict[int | None, list] = {}


def surface_similarity_edges(
    surfaces: DataFrame,
    max_distance: int = 2,
    block_prefix: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """Corpus-derived surface-form similarity graph (the north star's
    "iterative DataFrame self-join" input): distinct surfaces are blocked
    on (normalized prefix, LENGTH BAND), and only within-block pairs are
    compared (levenshtein <= max_distance). Blocking bounds the pair
    count — without it the self-join is quadratic in distinct surfaces,
    which is the SURVEY §7.4.4 landmine.

    The length band exploits ``levenshtein(a,b) >= |len(a)-len(b)|``:
    with band width ``max_distance + 1``, any pair within edit distance
    lands in the same or adjacent band, so each surface is emitted to its
    band and the next one and the join key is (prefix, band). Result set
    is IDENTICAL to prefix-only blocking (the levenshtein filter subsumes
    the band restriction) but a prefix block of B surfaces splits into
    ~B/bands pieces — on a real vocabulary a 1-char prefix block is huge
    and prefix-only blocking goes quadratic in it (round-1 VERDICT).

    ``max_block`` optionally caps members per (prefix, band) block to the
    ``max_block`` lexicographically-smallest surfaces (deterministic, a
    partitioned window) so worst-case per-block pairs are bounded by
    C(max_block, 2) under adversarial skew; None = no cap (exact result).

    Input: a DataFrame with a ``surface`` column. Output: (src, dst)
    undirected edges, src < dst.
    """
    band_w = max_distance + 1
    # distinct surfaces are vocabulary-bounded (not corpus-bounded):
    # materialize once so the blocked self-join doesn't re-derive the
    # upstream (possibly corpus-sized) surface extraction per side
    s = surfaces.select(F.col("surface")).distinct().localCheckpoint(eager=False)
    band0 = F.floor(F.length("surface") / band_w).cast("int")
    blocked = s.select(
        "surface",
        F.substring("surface", 1, block_prefix).alias("_pfx"),
        F.explode(F.array(band0, band0 + 1)).alias("_band"),
    )
    if max_block is not None:
        wb = Window.partitionBy("_pfx", "_band").orderBy("surface")
        blocked = (
            blocked.withColumn("_bn", F.row_number().over(wb))
            .filter(F.col("_bn") <= max_block)
            .drop("_bn")
        )
    a = blocked.select(F.col("surface").alias("src"), "_pfx", "_band")
    b = blocked.select(F.col("surface").alias("dst"), "_pfx", "_band")
    return (
        a.join(b, ["_pfx", "_band"])
        .filter(F.col("src") < F.col("dst"))
        .filter(F.levenshtein("src", "dst") <= max_distance)
        .select("src", "dst")
        # a pair can share both its bands — dedupe after the cheap filter
        .distinct()
    )


def canonical_map(spark: SparkSession, max_component: int | None = 1000) -> DataFrame:
    """(surface, canonical_id, canonical_name) over the alias graph.

    Canonical name = the component member whose id64 equals the component
    label (i.e. argmin id64). Surfaces with no alias edges are their own
    canonical entity.

    The map depends only on the alias dictionary (not the corpus) and is
    dictionary-sized by definition — so this is exactly the driver fast
    path of :func:`connected_components`, applied without any DataFrame
    round-trips (launching Spark jobs for ~20 literal rows cost a flat
    ~2 s of per-session fixed overhead). The distributed iterative loop
    is the corpus-scale path — see :func:`canonical_map_from_corpus` and
    the distributed-vs-driver equality tests in tests/test_canonicalize.py.
    """
    key = max_component
    if key not in _CANON_CACHE:
        _CANON_CACHE[key] = _canonical_map_rows(max_component)
    # per-session DataFrame memo on top of the row memo: the map is static
    # dictionary state, and re-running createDataFrame costs ~0.3-0.5 s of
    # Python->JVM conversion per query invocation (guide §4.5)
    cache = getattr(spark, "_kg_canon_map_df", None)
    if cache is None:
        cache = {}
        try:
            spark._kg_canon_map_df = cache
        except AttributeError:
            pass
    if key not in cache:
        cache[key] = spark.createDataFrame(
            _CANON_CACHE[key],
            "surface string, canonical_id long, canonical_name string",
        )
    return cache[key]


def _canonical_map_rows(max_component: int | None) -> list[tuple[str, int, str]]:
    from kg.ids import py_id64

    sym = [(s, t) for s, t in alias_pairs() if s != t]
    labels = dict(_driver_cc_rows(sym + [(t, s) for s, t in sym], max_component))
    by_id = {py_id64(n): n for n in labels}
    rows = []
    for surface, _ in alias_pairs():
        label = labels.get(surface, py_id64(surface))
        name = by_id.get(label, surface) if surface in labels else surface
        rows.append((surface, py_id64("ent:" + name), name))
    return sorted(rows)


def canonical_concept_rows(
    max_component: int | None = 1000,
) -> list[tuple[int, str]]:
    """Distinct (entity_id, name) concept rows of the dictionary
    canonical map, computed and memoized driver-side (static
    vocabulary — no Spark job). Shared by :func:`canonical_concepts`
    and the literal name-map lookup in kg.queries."""
    if max_component not in _CANON_CACHE:
        _CANON_CACHE[max_component] = _canonical_map_rows(max_component)
    return sorted({(cid, name) for _s, cid, name in _CANON_CACHE[max_component]})


def canonical_concepts(
    spark: SparkSession, max_component: int | None = 1000
) -> DataFrame:
    """Distinct (entity_id, name, kind='concept') node rows of the
    dictionary canonical map, deduplicated DRIVER-side (r06): the map is
    static vocabulary, so deriving concepts via ``canon.select(...)
    .distinct()`` paid a runtime Exchange per pipeline run for a
    dictionary-sized dedup a set comprehension does for free. Memoized
    per session like :func:`canonical_map`."""
    cache = getattr(spark, "_kg_concepts_df", None)
    if cache is None:
        cache = {}
        try:
            spark._kg_concepts_df = cache
        except AttributeError:
            pass
    if max_component not in cache:
        rows = canonical_concept_rows(max_component)
        cache[max_component] = spark.createDataFrame(
            [(cid, name, "concept") for cid, name in rows],
            "entity_id long, name string, kind string",
        )
    return cache[max_component]


def canonical_map_from_corpus(
    surfaces: DataFrame,
    max_distance: int = 1,
    block_prefix: int = 1,
    max_component: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """North-star canonicalization: connected components over the
    CORPUS-DERIVED surface-form similarity graph (no curated alias
    dictionary) — blocked levenshtein self-join → iterative DataFrame
    self-join CC with large-component capping → deterministic canonical
    ids (min id64 member names the component).

    Output (surface, canonical_id, canonical_name) covering EVERY input
    surface (edge-less surfaces canonicalize to themselves). At corpus
    scale the similarity graph exceeds the driver fastpath bound and the
    distributed label-propagation loop runs; at test scale the fastpath
    collects the dictionary-sized edge list (same labels, asserted in
    tests)."""
    s = surfaces.select(F.col("surface")).distinct()
    edges = surface_similarity_edges(
        s, max_distance=max_distance, block_prefix=block_prefix, max_block=max_block
    )
    labels = connected_components(edges, max_component=max_component)
    names = labels.filter(id64(F.col("node")) == F.col("label")).select(
        "label", F.col("node").alias("canonical_name")
    )
    mapped = labels.join(F.broadcast(names), "label").select(
        F.col("node").alias("surface"),
        id64(F.concat(F.lit("ent:"), F.col("canonical_name"))).alias("canonical_id"),
        "canonical_name",
    )
    identity = s.join(mapped, "surface", "left_anti").select(
        "surface",
        id64(F.concat(F.lit("ent:"), F.col("surface"))).alias("canonical_id"),
        F.col("surface").alias("canonical_name"),
    )
    return mapped.unionByName(identity)


def canonicalize_triples(triples_linked: DataFrame, canon: DataFrame) -> DataFrame:
    """Re-map provisional entity ids to canonical component ids."""
    ent_map = F.broadcast(
        canon.select(
            id64(F.concat(F.lit("ent:"), F.col("surface"))).alias("_from"),
            F.col("canonical_id").alias("_to"),
        ).distinct()
    )
    out = (
        triples_linked.join(
            ent_map.withColumnRenamed("_from", "subj_id").withColumnRenamed("_to", "_subj_to"),
            "subj_id",
            "left",
        )
        .join(
            ent_map.withColumnRenamed("_from", "obj_id").withColumnRenamed("_to", "_obj_to"),
            "obj_id",
            "left",
        )
        .select(
            "doc_id",
            "offset",
            F.coalesce("_subj_to", "subj_id").alias("subj_id"),
            "subj_kind",
            "pred",
            F.coalesce("_obj_to", "obj_id").alias("obj_id"),
            "obj_kind",
        )
    )
    return out
