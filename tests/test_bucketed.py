"""Bucketed-table co-location: self-join on the bucket key plans with NO
shuffle exchange (the reason edges are bucketed by subject hash). Auto-
broadcast is disabled for the assertion — at toy scale the planner would
broadcast instead (also fine, also shuffle-free for the big side), but at
100TB neither side broadcasts and bucketing is what removes the shuffle."""

from kg.materialize import write_bucketed_table
from kg.queries import q_edges
from tests.conftest import SF_DIR


def test_bucketed_self_join_has_no_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = q_edges(spark, SF_DIR)
        table = write_bucketed_table(spark, edges, n_buckets=8)
        t = spark.table(table)
        joined = t.alias("a").join(t.alias("b"), "subj_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() > 0
        # the same join on the unbucketed frame shuffles both sides
        plain = edges.alias("a").join(edges.alias("b"), "subj_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
