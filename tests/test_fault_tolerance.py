"""Task-level fault tolerance: the reference reschedules a failed
maple/juice task on another replica (mp3/src/maplejuice.go:285-307,
506-513); Spark's equivalent is task retry + lineage recompute
(SURVEY §4.1 "built-in"). This test actually exercises it: a maple
UDF whose first attempt on partition 0 crashes must still produce
the correct job result via retry.

Runs in a subprocess because retry needs a ``local[N, maxFailures]``
master, and the session-scoped test SparkSession pins ``local[*]``
(task retries are disabled in plain local mode — fail-fast).
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession
from pyspark import TaskContext
from distributed_computing_projects_spark.operators.maplejuice import maple, juice

spark = (
    SparkSession.builder.master("local[4, 2]")  # maxFailures=2 => one retry
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("fault-tolerance-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

lines = ["a b a", "b c", "a"] * 4
df = spark.createDataFrame([(l,) for l in lines], "line string")

def flaky_tokenize(line):
    tc = TaskContext.get()
    if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError("injected task failure (first attempt)")
    for tok in line.split():
        yield tok, "1"

kv = maple(df, flaky_tokenize, num_tasks=4)
out = juice(kv, lambda k, vs: sum(int(v) for v in vs), num_juices=2)
got = {r.key: int(r.value) for r in out.collect()}
assert got == {"a": 12, "b": 8, "c": 4}, got
print("RETRY-OK")
spark.stop()
"""


def test_maple_task_retry_recovers(tmp_path):
    import distributed_computing_projects_spark as pkg
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@REPO@", repo)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY-OK" in proc.stdout
    # the injected failure really happened (retry, not a no-op)
    assert "injected task failure" in proc.stderr
