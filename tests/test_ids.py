from pyspark.sql import functions as F

from kg.ids import id64, py_id64


def test_id64_matches_python(spark):
    samples = ["", "a", "record", "ent:batch", "doc-0000042", "media://img/1-2"]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s", id64(F.col("s")).alias("i")
    )
    got = {r.s: r.i for r in df.collect()}
    assert got == {s: py_id64(s) for s in samples}


def test_id64_positive_and_stable():
    assert py_id64("record") == 1000220295270014851
    assert all(py_id64(s) >= 0 for s in ["x", "y", "z"])
