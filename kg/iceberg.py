"""Iceberg routing (SURVEY §7.1 stage 4 / §7.4.7; north rule: "partitioned
Iceberg nodes/edges tables bucketed by subject hash").

The jar (``iceberg-spark-runtime-*``) is NOT baked into this container
(probed: no lakehouse jars under pyspark/jars, $SPARK_HOME/jars, or
$ICEBERG_JAR — see ``tests/test_iceberg.py``, which re-runs the probe
every session), and installing packages is out of scope. So the table
format is a PROBE + ROUTE seam:

* :func:`find_iceberg_jar` — filesystem probe for the runtime jar
  (must run BEFORE the session is built: Iceberg needs session-level
  catalog conf);
* :func:`configure_builder` — adds the Iceberg extension + a local
  hadoop catalog to a SparkSession.Builder when the jar is present
  (wired into ``kg.session.get_spark``);
* :func:`iceberg_enabled` — runtime check on a live session;
* :func:`write_edges_iceberg` / :func:`write_nodes_iceberg` — the real
  Iceberg writes: ``writeTo(...).partitionedBy(bucket(N, subj_id))``
  uses Iceberg's bucket partition transform — the exact north-star
  layout (hash-bucketed by subject) with Iceberg's hidden partitioning
  instead of a physical bucket column.

When the jar is absent every caller falls back to the parquet layout in
``kg.materialize`` (explicit bucket column + real Spark bucketBy catalog
table), which carries the same co-location guarantees minus Iceberg's
snapshot metadata — the §7.4.7 documented fallback.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG = "kg_ice"


def find_iceberg_jar() -> str | None:
    """Locate an iceberg-spark-runtime jar, or None. Checked locations:
    $ICEBERG_JAR, $SPARK_HOME/jars, the pyspark package's jars dir."""
    cand = os.environ.get("ICEBERG_JAR")
    if cand and os.path.exists(cand):
        return cand
    dirs = []
    if os.environ.get("SPARK_HOME"):
        dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover
        pass
    for d in dirs:
        hits = sorted(glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[0]
    return None


def configure_builder(builder, warehouse: str):
    """Add Iceberg extension + a local hadoop catalog iff the jar is
    present. Returns the (possibly updated) builder."""
    jar = find_iceberg_jar()
    if jar is None:
        return builder
    return (
        builder.config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config(
            f"spark.sql.catalog.{CATALOG}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
        .config(
            f"spark.sql.catalog.{CATALOG}.warehouse",
            os.path.join(warehouse, "iceberg"),
        )
    )


def iceberg_enabled(spark: SparkSession) -> bool:
    """True iff the session has the Iceberg catalog configured AND the
    runtime class actually loads."""
    if spark.conf.get(f"spark.sql.catalog.{CATALOG}", None) is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_edges_iceberg(
    spark: SparkSession,
    edges: DataFrame,
    table: str = "edges",
    n_buckets: int = 64,
) -> str:
    """Materialize edges as an Iceberg table hash-bucketed by subject —
    ``partitionedBy(bucket(n, subj_id))`` is Iceberg's hidden-partition
    analog of the parquet layout's explicit bucket column. Requires
    :func:`iceberg_enabled`; callers fall back to
    ``kg.materialize.materialize_edges`` otherwise."""
    full = f"{CATALOG}.db.{table}"
    (
        edges.sortWithinPartitions("subj_id")
        .writeTo(full)
        .using("iceberg")
        .partitionedBy(F.bucket(n_buckets, F.col("subj_id")))
        .createOrReplace()
    )
    return full


def write_nodes_iceberg(
    spark: SparkSession, nodes: DataFrame, table: str = "nodes"
) -> str:
    full = f"{CATALOG}.db.{table}"
    nodes.writeTo(full).using("iceberg").createOrReplace()
    return full


def probe_report() -> dict:
    """One-line probe summary for docs/tests."""
    jar = find_iceberg_jar()
    return {
        "iceberg_jar": jar,
        "available": jar is not None,
        "fallback": "parquet part_group layout + bucketBy catalog table"
        if jar is None
        else None,
    }
