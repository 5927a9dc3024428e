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


# Exec-tier analog of the reference's whole-block reschedule
# (mp3/src/maplejuice.go:285-307): a crashed maple binary may have
# ALREADY EMITTED part of its output. The reference re-runs the whole
# block on another worker and discards the partial emit; Spark's
# equivalent is that a failed task's output is never committed — the
# retry re-pipes the whole partition. This script's binary emits a
# bogus line then exits 1 on its first invocation (marker file), and
# behaves correctly on the retry; the job result must contain exactly
# the correct pairs, with no trace of the partial first emit.
_EXEC_SCRIPT = r"""
import os, stat, sys
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession
from distributed_computing_projects_spark.operators.maplejuice import maple_exec

marker = "@TMP@/attempted"
exe = "@TMP@/flaky_tokenizer.sh"
with open(exe, "w") as f:
    f.write(
        "#!/bin/bash\n"
        f"if [ ! -f {marker} ]; then\n"
        f"  touch {marker}\n"
        "  echo 'PARTIAL,999'\n"   # partial emit that must be discarded
        "  exit 1\n"
        "fi\n"
        "while read -r line; do\n"
        "  for tok in $line; do echo \"$tok,1\"; done\n"
        "done\n"
    )
os.chmod(exe, os.stat(exe).st_mode | stat.S_IXUSR)

spark = (
    SparkSession.builder.master("local[2, 2]")  # maxFailures=2 => one retry
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("exec-fault-tolerance-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

lines = ["a b a", "b c", "a"]
# one partition => one exec invocation per attempt, so the marker
# deterministically fails exactly the first attempt
df = spark.createDataFrame([(l,) for l in lines], "line string").coalesce(1)
rows = sorted((r.key, r.value) for r in maple_exec(df, exe).collect())
assert rows == sorted(
    [("a", "1"), ("b", "1"), ("a", "1"), ("b", "1"), ("c", "1"), ("a", "1")]
), rows
assert os.path.exists(marker), "first attempt never ran"
print("EXEC-RETRY-OK")
spark.stop()
"""


def test_maple_exec_partial_emit_crash_retries_whole_block(tmp_path):
    import distributed_computing_projects_spark as pkg
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    script = _EXEC_SCRIPT.replace("@REPO@", repo).replace("@TMP@", str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "EXEC-RETRY-OK" in proc.stdout
    # the crash was real: first attempt died in CalledProcessError
    assert "CalledProcessError" in proc.stderr or "returned non-zero" in proc.stderr
