"""Linking: dictionary resolution + salted-join equivalence under skew."""

from pyspark.sql import functions as F

from kg.extract import extract_triples
from kg.ids import py_id64
from kg.link import alias_dict, link_triples, salted_join
from kg.normalize import normalize_spans
from kg.oracles import linked_sql
from kg.synth import load_interleaved
from tests.conftest import SF_DIR, assert_df_equal


def test_linked_matches_duckdb(spark, duck):
    docs = load_interleaved(spark, SF_DIR)
    linked = link_triples(extract_triples(normalize_spans(docs)), alias_dict(spark))
    assert_df_equal(linked, duck.sql(linked_sql()))


def test_alias_one_hop(spark):
    # 'line' links to one-hop target 'row' (NOT the final canonical 'record')
    aliases = alias_dict(spark)
    row = aliases.filter(F.col("surface") == "line").collect()[0]
    assert row.target == "row" and row.target_id == py_id64("ent:row")


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 10k rows of one hot key + tail
    big = spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k9001", 2), ("k9500", 3)], "k string, grp int"
    )
    plain = big.join(small, "k", "left").select("k", "v", "grp")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "v", "grp")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    # inner join variant too
    plain_i = big.join(small, "k").select("k", "v", "grp")
    salted_i = salted_join(big, small, "k", n_salts=8, how="inner").select("k", "v", "grp")
    assert plain_i.exceptAll(salted_i).count() == 0
    assert salted_i.exceptAll(plain_i).count() == 0
