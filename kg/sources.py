"""Sources: schema-pinned JSONL scan with an error budget (SURVEY §2.1 S1/S2).

Reference analog: ``stream_records`` (``data/scripts/data_processor.py:
248-303``) — line-by-line ``json.loads`` that skips malformed lines and
aborts when more than ``MAX_ERRORS_PER_BATCH=100`` accumulate
(``data/scripts/config.py:65``). Spark-first translation: a PERMISSIVE
schema-pinned read whose in-struct corrupt-record column makes bad lines
countable declaratively — the error budget becomes one aggregate instead
of hand-rolled counters, and the scan parallelizes by input split (S2's
buffered batching comes free).

Single-pass budget (round 2): :func:`read_jsonl_deferred` attaches the
bad-line count as a ``df.observe()`` metric, so the budget is computed as
a side effect of the CONSUMER'S first action over the same scan — zero
extra passes (at 100 TB the round-1 eager ``.count()`` was one full extra
read of the input). The reference's own abort is equally post-hoc: it
stops after the batch that overflowed the budget, not before reading it.
:func:`read_jsonl` keeps the eager contract (raise before returning) for
callers that want fail-fast on small inputs, at the cost of one
validation pass.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

MAX_ERRORS = 100
CORRUPT_COL = "_corrupt_record"


class ErrorBudgetExceeded(RuntimeError):
    pass


def read_jsonl_deferred(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_errors: int = MAX_ERRORS,
) -> tuple[DataFrame, Callable[[], int]]:
    """Read JSONL with a pinned schema, bad lines dropped; budget checked
    on the consumer's OWN first action (single pass over the input).

    Returns ``(df, check)``: ``df`` holds only well-formed rows; call
    ``check()`` after the first action on ``df`` — it raises
    :class:`ErrorBudgetExceeded` if more than ``max_errors`` lines failed
    to parse during that action, else returns the bad-line count.
    (``check()`` blocks until an action has run — don't call it first.)
    """
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
    obs = Observation()
    observed = parsed.observe(
        obs, F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias("n_bad")
    )
    good = observed.filter(~bad).select("r.*").drop(CORRUPT_COL)

    def check() -> int:
        n_bad = int(obs.get["n_bad"])
        if n_bad > max_errors:
            raise ErrorBudgetExceeded(
                f"{n_bad} malformed lines > budget {max_errors}"
            )
        return n_bad

    return good, check


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_errors: int = MAX_ERRORS,
) -> DataFrame:
    """Eager variant: validates the budget before returning (one
    validation pass — the observed count doubles as the action). Use
    :func:`read_jsonl_deferred` in pipelines to fold the budget into the
    first real action instead."""
    good, check = read_jsonl_deferred(spark, path, schema, max_errors)
    good.count()
    check()
    return good
