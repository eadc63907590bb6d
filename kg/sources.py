"""Sources: schema-pinned JSONL scan with an error budget (SURVEY §2.1 S1/S2).

Reference analog: ``stream_records`` (``data/scripts/data_processor.py:
248-303``) — line-by-line ``json.loads`` that skips malformed lines and
aborts when more than ``MAX_ERRORS_PER_BATCH=100`` accumulate
(``data/scripts/config.py:65``). Spark-first translation: a PERMISSIVE
schema-pinned ``spark.read.json`` whose ``_corrupt_record`` column makes
bad lines countable declaratively — the error budget becomes one
aggregate instead of hand-rolled counters, and the scan parallelizes by
input split (S2's buffered batching comes free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

MAX_ERRORS = 100
CORRUPT_COL = "_corrupt_record"


class ErrorBudgetExceeded(RuntimeError):
    pass


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_errors: int = MAX_ERRORS,
) -> DataFrame:
    """Read JSONL with a pinned schema; skip bad lines; abort past budget.

    Returns only well-formed rows (bad lines dropped). Raises
    :class:`ErrorBudgetExceeded` if more than ``max_errors`` lines fail to
    parse — the reference's abort semantics, expressed as one count.
    """
    from pyspark.sql.types import StringType

    # text + from_json rather than spark.read.json with _corrupt_record:
    # (a) Spark disallows querying only the corrupt column uncached, and
    # (b) caching to work around it serves STALE rows if the file changes
    # between reads in one session (both found by probing). from_json
    # yields NULL for malformed lines — countable with no cache at all.
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = raw.select(
        F.from_json(
            "value", full, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("r")
    )
    bad = F.col("r").isNull() | F.col("r")[CORRUPT_COL].isNotNull()
    n_bad = parsed.filter(bad).count()
    if n_bad > max_errors:
        raise ErrorBudgetExceeded(f"{n_bad} malformed lines > budget {max_errors}")
    return parsed.filter(~bad).select("r.*").drop(CORRUPT_COL)
