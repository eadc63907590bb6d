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
