"""Graph-analytics queries (round-5): degree-ordered triangle counting and
neighborhood-Jaccard link prediction over the concept graph — oracle
parity plus the link-predictor's hub-cap dial semantics."""

from pyspark.sql import functions as F

from kg.queries import (
    link_prediction_sql,
    q_link_prediction,
    q_triangles,
    triangles_sql,
)
from tests.conftest import SF_DIR, assert_df_equal


def test_triangles_matches_oracle(spark, duck):
    assert_df_equal(q_triangles(spark, SF_DIR), duck.sql(triangles_sql()))


def test_triangles_internal_consistency(spark):
    """Every triangle is counted at all three corners, so sum(n_triangles)
    is divisible by 3; clustering is in [0, 1]; and a node's triangle
    count can never exceed C(degree, 2) (each triangle uses a distinct
    neighbor pair)."""
    rows = q_triangles(spark, SF_DIR).collect()
    total = sum(r.n_triangles for r in rows)
    assert total > 0, "concept graph at sf0.001 should close triangles"
    assert total % 3 == 0
    for r in rows:
        assert 0.0 <= r.clustering <= 1.0
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_link_prediction_matches_oracle(spark, duck):
    assert_df_equal(
        q_link_prediction(spark, SF_DIR), duck.sql(link_prediction_sql())
    )


def test_link_prediction_excludes_existing_edges(spark):
    """Predicted pairs must be non-adjacent: anti-join leftover would be a
    correctness bug, not a ranking quirk."""
    pred = q_link_prediction(spark, SF_DIR).select("node_u", "node_v")
    from kg.queries import _association_graph

    und, _ = _association_graph(spark, SF_DIR)
    overlap = pred.join(
        und,
        (pred.node_u == und.u) & (pred.node_v == und.v),
    ).count()
    assert overlap == 0


def test_link_prediction_hub_cap_dial(spark):
    """max_center_degree semantics: a cap at/above the max degree is a
    no-op (bit-identical top-n); a tiny cap only removes candidate mass —
    every surviving pair's common-neighbor count is <= its uncapped
    value (hub centers stop generating, they never add)."""
    from kg.queries import _association_graph

    _, deg = _association_graph(spark, SF_DIR)
    dmax = deg.agg(F.max("degree")).collect()[0][0]

    base = q_link_prediction(spark, SF_DIR, top_n=1 << 30)
    capped_noop = q_link_prediction(
        spark, SF_DIR, top_n=1 << 30, max_center_degree=dmax
    )
    b = {(r.node_u, r.node_v): r.common_neighbors for r in base.collect()}
    n = {(r.node_u, r.node_v): r.common_neighbors
         for r in capped_noop.collect()}
    assert b == n

    capped = q_link_prediction(
        spark, SF_DIR, top_n=1 << 30, max_center_degree=max(2, dmax // 4)
    )
    c = {(r.node_u, r.node_v): r.common_neighbors for r in capped.collect()}
    assert set(c) <= set(b)
    assert all(c[k] <= b[k] for k in c)
    assert len(c) < len(b), "a quartered cap should drop hub-centered pairs"


def test_bfs_levels_semantics_on_synthetic_graph(spark):
    """The frontier loop's invariants, on a graph where they actually
    bind (the fixture's association graph is a near-clique): a path
    3-1-2-4-5 plus a 6-7 component seeded at 3 must yield min-hop levels
    through the undirected path, cap at max_levels, and never emit the
    disconnected component. The 1-2 back-edge makes a cycle with the
    seed's two-hop path, so min-level (not first-path) semantics are
    exercised too."""
    from kg.queries import bfs_from

    und = spark.createDataFrame(
        [(1, 3), (1, 2), (2, 4), (4, 5), (2, 3), (6, 7)], "u long, v long"
    )
    seed = spark.createDataFrame([(3,)], "entity_id long")
    got = {
        r.entity_id: r.level for r in bfs_from(und, seed, 6).collect()
    }
    assert got == {3: 0, 1: 1, 2: 1, 4: 2, 5: 3}

    capped = {
        r.entity_id: r.level for r in bfs_from(und, seed, 2).collect()
    }
    assert capped == {3: 0, 1: 1, 2: 1, 4: 2}


def test_pmi_identities(spark, duck):
    """PMI's internal consistency on the fixture: the count columns obey
    their definitional identities (sum(n_uv) = T, each endpoint count =
    sum of its pairs' n_uv) and the score is symmetric-normalized — a
    pair co-occurring MORE than chance has pmi > 0 iff
    4*T*n_uv > cnt_u*cnt_v (exact integers, no float in the gate)."""
    from kg.queries import q_pmi

    rows = q_pmi(spark, SF_DIR).collect()
    t_total = sum(r.n_uv for r in rows)
    by_node: dict = {}
    for r in rows:
        by_node[r.node_u] = by_node.get(r.node_u, 0) + r.n_uv
        by_node[r.node_v] = by_node.get(r.node_v, 0) + r.n_uv
    for r in rows:
        assert by_node[r.node_u] == r.cnt_u and by_node[r.node_v] == r.cnt_v
        assert (r.pmi > 0) == (4 * t_total * r.n_uv > r.cnt_u * r.cnt_v)


def test_kcore_peeling_cascade_and_fixpoint(spark):
    """Peeling semantics where they bind: triangle {1,2,3} with a tail
    3-4-5 at k=2 — the first round removes only node 5 (degree 1), the
    SECOND round removes node 4 (its degree fell to 1 after the first),
    so a single-pass degree filter would get this wrong; the triangle
    survives with within-core degree 2. On the fixture, the contract's
    KCORE_ITERS rounds must have converged (one more round changes
    nothing)."""
    from kg.queries import KCORE_ITERS, kcore_membership, q_kcore

    und = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    got = {
        (r.entity_id, r.core_degree)
        for r in kcore_membership(und, 2, 4).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 2)}
    # one round is NOT enough: node 4 still present after round 1
    after1 = {
        r.entity_id for r in kcore_membership(und, 2, 1).collect()
    }
    assert 4 in after1 and 5 not in after1

    a = sorted(map(tuple, q_kcore(spark, SF_DIR).collect()))
    from kg.queries import KCORE_K, _association_graph

    und_fx, _ = _association_graph(spark, SF_DIR)
    b = sorted(
        map(
            tuple,
            kcore_membership(und_fx, KCORE_K, KCORE_ITERS + 1).collect(),
        )
    )
    assert a == b
    # the peel is nontrivial AND cascade-decided on the fixture: some
    # node survives the first round but not the fixpoint
    survivors = {t[0] for t in a}
    after1 = {
        r.entity_id
        for r in kcore_membership(und_fx, KCORE_K, 1).collect()
    }
    assert survivors and survivors < after1
