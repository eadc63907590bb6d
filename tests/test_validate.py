"""Output-validation report (reference validate_data.py analog)."""

import pytest
from pyspark.sql import functions as F

from kg.pipeline import run_pipeline
from kg.validate import assert_valid, validate_output
from tests.conftest import SF_DIR


def test_validation_green_on_real_output(spark, tmp_path):
    out = str(tmp_path / "v")
    run_pipeline(spark, SF_DIR, out, extractor="fused")
    rep = validate_output(spark, out)
    bad = rep.filter(~F.col("ok")).collect()
    assert not bad, bad
    assert_valid(spark, out)  # no raise
    checks = {(r.table, r.check) for r in rep.collect()}
    assert ("nodes", "no_duplicate_pk") in checks
    assert ("nodes", "mention_total_eq_2x_edges") in checks
    assert ("edges", "bucket_in_range") in checks


def test_validation_catches_corruption(spark, tmp_path):
    out = str(tmp_path / "v2")
    run_pipeline(spark, SF_DIR, out, extractor="fused")
    # corrupt: duplicate the nodes table onto itself -> duplicate PKs
    nodes = spark.read.parquet(f"{out}/nodes")
    nodes.write.mode("append").parquet(f"{out}/nodes")
    with pytest.raises(AssertionError, match="no_duplicate_pk"):
        assert_valid(spark, out)
