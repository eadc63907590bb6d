"""Task-failure injection drill (round-4 VERDICT item 6; reference Gate C
analog, ``project idea.pdf`` p.6: kill one query node mid-query, <10 s
recovery — on Spark the recovery mechanism is task re-execution).

Runs the fused extraction once in its own JVM with master ``local[4,2]``
(``spark.task.maxFailures=2`` in local mode is set via the master string;
the conf key is ignored there). If ``KG_FAIL_TASK_ONCE`` is in the
environment when this process starts, the fused kernel raises on the
first attempt of partition 0 (``kg/fused.py:_maybe_inject_failure``) and
Spark must retry that one task and still succeed.

Prints ONE JSON line: ``{"hash": md5-of-sorted-rows, "rows": N,
"failed_tasks": F}`` — the pytest drill (``tests/test_failure_drill.py``)
runs this twice, with and without the env var, and asserts
``failed_tasks`` goes 0 -> 1 while ``hash`` stays identical.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kg.fused import fused_extract_triples  # noqa: E402
from kg.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app="failure-drill", master="local[4,2]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("drill", "fused extract under injection")
    rows = fused_extract_triples(spark, SF_DIR).collect()
    failed = 0
    for jid in tracker.getJobIdsForGroup("drill"):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                failed += si.numFailedTasks
    digest = hashlib.md5(
        "\n".join(sorted("|".join(map(str, r)) for r in rows)).encode()
    ).hexdigest()
    print(json.dumps({"hash": digest, "rows": len(rows), "failed_tasks": failed}))
    spark.stop()


if __name__ == "__main__":
    main()
