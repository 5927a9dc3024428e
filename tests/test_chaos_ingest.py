"""Chaos test for the streaming dedup ingest loop — the reference's
``sim failtest`` discipline (mp3/src/monitor.go:78-97) applied to the
repo's one stateful path.

Three real failure modes, each asserted against a clean sequential
run (the third — a SIGKILLed executor JVM on a two-executor
local-cluster — is its own test below):

1. **Task-attempt crash inside the batch lineage**: the foreachBatch
   callback wraps the incoming batch in a mapInPandas pass-through
   whose first attempt on partition 0 dies. With ``local[4, 2]``
   (maxFailures=2) Spark retries the task — exercising real task
   re-execution inside probe_and_ingest's jobs, not a simulated
   re-call.
2. **foreachBatch crash AFTER the batch fully commits** (pairs written
   AND survivor bands appended), killing the streaming query. The
   query is then restarted from the same checkpoint, and Structured
   Streaming re-runs the failed batch with the SAME batch_id — the
   worst-case double-processing the batch-id overwrite contract
   (bandstore.probe_and_ingest) exists for. Reverting that contract
   (e.g. append-mode pairs) makes this test fail with duplicated
   pairs.

Runs in a subprocess because retry needs a ``local[N, maxFailures]``
master and the session-scoped test SparkSession pins ``local[*]``.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import glob, os, shutil, sys
sys.path.insert(0, "@REPO@")
os.environ["PYTHONPATH"] = "@REPO@"
from pyspark.sql import Row, SparkSession
from pyspark import TaskContext
from distributed_computing_projects_spark.operators import bandstore as BS

spark = (
    SparkSession.builder.master("local[4, 2]")  # maxFailures=2 => one retry
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("chaos-ingest-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

work = "@TMP@"
X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
Y = "one two three four five six seven eight nine ten"
corpus_rows = [
    Row(doc_id=1, text="totally unrelated words in this document body"),
    Row(doc_id=2, text=Y),
]
epoch0_rows = [
    Row(doc_id=10, text=X),          # survivor
    Row(doc_id=11, text=Y),          # dup of corpus doc 2
]
epoch1_rows = [
    Row(doc_id=20, text=X),          # dup of epoch-0 SURVIVOR 10
    Row(doc_id=21, text="fresh brand new content never seen anywhere"),
]
corpus = spark.createDataFrame(corpus_rows)
epochs = [spark.createDataFrame(r) for r in (epoch0_rows, epoch1_rows)]
schema = corpus.schema
THRESH = 0.5

def pair_set(out_dir):
    # MULTISET, not set: a broken idempotence contract shows up as the
    # same pair written twice, which a set comparison would hide
    parts = glob.glob(os.path.join(out_dir, "batch-*"))
    if not parts:
        return []
    df = spark.read.parquet(*parts)
    return sorted((r.new_id, r.corpus_id, round(r.est_jaccard, 9))
                  for r in df.collect())

# ---- sequential oracle: clean run, no failures --------------------
oracle_store = os.path.join(work, "oracle_store")
oracle_out = os.path.join(work, "oracle_pairs")
BS.write_bands(corpus, oracle_store, "doc_id", "text")
for i, e in enumerate(epochs):
    BS.probe_and_ingest(spark, oracle_store, e, "doc_id", "text",
                        oracle_out, threshold=THRESH, batch_id=i)
expected = pair_set(oracle_out)
assert expected, "oracle produced no pairs — fixture is degenerate"

# ---- chaos run ----------------------------------------------------
store = os.path.join(work, "store")
landing = os.path.join(work, "landing")
out_dir = os.path.join(work, "pairs")
ckpt = os.path.join(work, "ckpt")
os.makedirs(landing)
BS.write_bands(corpus, store, "doc_id", "text")

now = 1_700_000_000
for i, e in enumerate(epochs):
    stage = os.path.join(work, "stage%d" % i)
    e.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dest = os.path.join(landing, "batch-%d.parquet" % i)
    shutil.move(part, dest)
    os.utime(dest, (now + i, now + i))

task_marker = os.path.join(work, "task_crashes")
batch_marker = os.path.join(work, "batch_crashed")

def chaotic(batch_df, batch_id):
    marker = task_marker  # close over str, not the test module

    def crash_once(it):
        tc = TaskContext.get()
        if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
            with open(marker, "a") as f:
                f.write("task attempt 0 partition 0 killed\n")
            raise RuntimeError("injected executor task failure")
        for pdf in it:
            yield pdf

    wrapped = batch_df.mapInPandas(crash_once, schema=batch_df.schema)
    BS.probe_and_ingest(spark, store, wrapped, "doc_id", "text",
                        out_dir, threshold=THRESH, batch_id=batch_id)
    if batch_id == 0 and not os.path.exists(batch_marker):
        open(batch_marker, "w").close()
        raise RuntimeError("injected post-commit foreachBatch crash")

def run_stream():
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(chaotic)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    except Exception as e:  # StreamingQueryException on batch failure
        return e
    finally:
        if q.isActive:
            q.stop()
    return q.exception()

exc = run_stream()
assert exc is not None, "first run must die on the injected batch crash"
assert os.path.exists(batch_marker), "batch-0 crash never fired"
# restart from the SAME checkpoint: batch 0 re-runs with batch_id=0
exc = run_stream()
assert exc is None, "restarted run failed: %s" % exc

got = pair_set(out_dir)
assert got == expected, "chaos pairs != oracle: got=%r want=%r" % (got, expected)
assert os.path.exists(task_marker), "task-level crash never fired"

# the re-run really double-appended survivor bands (at-least-once), and
# compaction removes exactly that growth without changing probes
probe_before = {(r.new_id, r.corpus_id) for r in
                BS.incremental_pairs_against_store(
                    spark, store, epochs[1], "doc_id", "text",
                    threshold=THRESH).collect()}
before, after = BS.compact_store(spark, store)
assert before > after, "expected duplicate band rows from the re-run"
probe_after = {(r.new_id, r.corpus_id) for r in
               BS.incremental_pairs_against_store(
                   spark, store, epochs[1], "doc_id", "text",
                   threshold=THRESH).collect()}
assert probe_before == probe_after
print("CHAOS-OK")
spark.stop()
"""


def test_ingest_loop_survives_task_and_batch_crashes(tmp_path):
    import os

    import distributed_computing_projects_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    script = _SCRIPT.replace("@REPO@", repo).replace("@TMP@", str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "CHAOS-OK" in proc.stdout
    # both injected failures really happened
    assert "injected executor task failure" in proc.stderr


_CADENCE_SCRIPT = r"""
import glob, os, shutil, sys
sys.path.insert(0, "@REPO@")
os.environ["PYTHONPATH"] = "@REPO@"
from pyspark.sql import Row, SparkSession
from distributed_computing_projects_spark.operators import bandstore as BS

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("chaos-compaction-cadence-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

work = "@TMP@"
X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
Y = "one two three four five six seven eight nine ten"
corpus_rows = [
    Row(doc_id=1, text="totally unrelated words in this document body"),
    Row(doc_id=2, text=Y),
]
epoch0_rows = [Row(doc_id=10, text=X), Row(doc_id=11, text=Y)]
epoch1_rows = [
    Row(doc_id=20, text=X),  # dup of epoch-0 survivor 10
    Row(doc_id=21, text="fresh brand new content never seen anywhere"),
]
corpus = spark.createDataFrame(corpus_rows)
epochs = [spark.createDataFrame(r) for r in (epoch0_rows, epoch1_rows)]
schema = corpus.schema
THRESH = 0.5
EVERY = 1  # compaction scheduled after every batch with batch_id > 0

def pair_set(out_dir):
    parts = glob.glob(os.path.join(out_dir, "batch-*"))
    if not parts:
        return []
    df = spark.read.parquet(*parts)
    return sorted((r.new_id, r.corpus_id, round(r.est_jaccard, 9))
                  for r in df.collect())

def store_rows(path):
    return sorted((r.id, r.band, r.key)
                  for r in spark.read.parquet(path).collect())

# ---- sequential oracle: clean run WITH the compaction cadence ------
oracle_store = os.path.join(work, "oracle_store")
oracle_out = os.path.join(work, "oracle_pairs")
BS.write_bands(corpus, oracle_store, "doc_id", "text")
for i, e in enumerate(epochs):
    BS.probe_and_ingest(spark, oracle_store, e, "doc_id", "text",
                        oracle_out, threshold=THRESH, batch_id=i,
                        compact_every=EVERY)
expected_pairs = pair_set(oracle_out)
expected_rows = store_rows(oracle_store)
assert expected_pairs, "oracle produced no pairs"

# ---- chaos run: crash BETWEEN survivor append and compaction -------
store = os.path.join(work, "store")
landing = os.path.join(work, "landing")
out_dir = os.path.join(work, "pairs")
ckpt = os.path.join(work, "ckpt")
os.makedirs(landing)
BS.write_bands(corpus, store, "doc_id", "text")

now = 1_700_000_000
for i, e in enumerate(epochs):
    stage = os.path.join(work, "stage%d" % i)
    e.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dest = os.path.join(landing, "batch-%d.parquet" % i)
    shutil.move(part, dest)
    os.utime(dest, (now + i, now + i))

crash_marker = os.path.join(work, "compaction_crashed")
real_compact = BS.compact_store
compactions = {"n": 0}

def flaky_compact(spark_, path_):
    # first scheduled compaction dies BEFORE doing any work: the
    # survivor append of this batch is already committed, the store
    # still carries its append-growth, and the stream is killed at
    # exactly the window between the two maintenance steps
    if not os.path.exists(crash_marker):
        open(crash_marker, "w").close()
        raise RuntimeError("injected crash between append and compaction")
    compactions["n"] += 1
    return real_compact(spark_, path_)

BS.compact_store = flaky_compact

def body(batch_df, batch_id):
    BS.probe_and_ingest(spark, store, batch_df, "doc_id", "text",
                        out_dir, threshold=THRESH, batch_id=batch_id,
                        compact_every=EVERY)

def run_stream():
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    except Exception as e:
        return e
    finally:
        if q.isActive:
            q.stop()
    return q.exception()

exc = run_stream()
assert exc is not None, "first run must die on the injected compaction crash"
assert os.path.exists(crash_marker), "compaction crash never fired"
# the crash window's precondition really held: batch 1's pairs are
# committed (append happened) but no compaction ran
assert compactions["n"] == 0

# restart from the SAME checkpoint: batch 1 re-runs with batch_id=1,
# re-appends its survivors (at-least-once), and the RETRIED batch's
# scheduled compaction now runs — cadence keyed to batch_id, no drift
exc = run_stream()
assert exc is None, "restarted run failed: %s" % exc
assert compactions["n"] >= 1, "retry never re-ran the scheduled compaction"

assert pair_set(out_dir) == expected_pairs, "pairs diverged from oracle"
# store CONVERGED to the clean run's exact rows: the retry's duplicate
# survivor appends were reclaimed by the re-run compaction
assert store_rows(store) == expected_rows, "store rows diverged"
assert not os.path.exists(store + ".__compact__")
assert not os.path.exists(store + ".__pre_compact__")
print("CADENCE-CHAOS-OK")
spark.stop()
"""


def test_compaction_cadence_survives_crash_before_compaction(tmp_path):
    """VERDICT r8 #7: kill the stream BETWEEN the survivor append and
    the scheduled compaction; a restart from checkpoint must re-run the
    batch (same batch_id), fire the missed compaction, and converge the
    store to byte-equal rows with a clean compacting run."""
    import os

    import distributed_computing_projects_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    script = _CADENCE_SCRIPT.replace("@REPO@", repo).replace(
        "@TMP@", str(tmp_path)
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "CADENCE-CHAOS-OK" in proc.stdout


_KILL_SCRIPT = r"""
import glob, os, signal, sys, threading, time
sys.path.insert(0, "@REPO@")
os.environ["PYTHONPATH"] = "@REPO@"
from pyspark.sql import Row, SparkSession
from pyspark import TaskContext
from distributed_computing_projects_spark.operators import bandstore as BS

spark = (
    SparkSession.builder.master("local-cluster[2, 2, 1024]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("executor-kill-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

work = "@TMP@"
X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
Y = "one two three four five six seven eight nine ten"
corpus = spark.createDataFrame([
    Row(doc_id=1, text="totally unrelated words in this document body"),
    Row(doc_id=2, text=Y),
])
batch = spark.createDataFrame([
    Row(doc_id=10, text=X),
    Row(doc_id=11, text=Y),   # dup of corpus doc 2
])
THRESH = 0.5

def pairs_of(out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "batch-0"))
    return sorted((r.new_id, r.corpus_id, round(r.est_jaccard, 9))
                  for r in df.collect())

# clean oracle run first (also warms codegen so the chaos run's
# sleep+kill window dominates its timeline)
oracle_store = os.path.join(work, "oracle_store")
oracle_out = os.path.join(work, "oracle_pairs")
BS.write_bands(corpus, oracle_store, "doc_id", "text")
BS.probe_and_ingest(spark, oracle_store, batch, "doc_id", "text",
                    oracle_out, threshold=THRESH, batch_id=0)
expected = pairs_of(oracle_out)
assert expected, "oracle produced no pairs"

store = os.path.join(work, "store")
out_dir = os.path.join(work, "pairs")
BS.write_bands(corpus, store, "doc_id", "text")

pid_file = os.path.join(work, "executor_pid")

def executor_jvm_pid():
    # python worker -> pyspark daemon -> executor JVM: walk /proc
    # ppids until the cmdline names CoarseGrainedExecutorBackend
    pid = os.getpid()
    for _ in range(6):
        with open("/proc/%d/stat" % pid) as f:
            ppid = int(f.read().split()[3])
        try:
            with open("/proc/%d/cmdline" % ppid, "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            return None
        if "CoarseGrainedExecutorBackend" in cmd:
            return ppid
        pid = ppid
    return None

def hold_first_attempt(it):
    tc = TaskContext.get()
    if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
        jvm = executor_jvm_pid()
        if jvm:
            tmp = "@TMP@/executor_pid.tmp"
            with open(tmp, "w") as f:
                f.write(str(jvm))
            os.rename(tmp, "@TMP@/executor_pid")
        time.sleep(60)  # hold the task so the kill lands mid-run
    for pdf in it:
        yield pdf

killed = {}

def killer():
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.exists(pid_file):
        time.sleep(0.2)
    if not os.path.exists(pid_file):
        return
    jvm = int(open(pid_file).read())
    os.kill(jvm, signal.SIGKILL)   # a REAL executor JVM dies mid-task
    killed["pid"] = jvm

t = threading.Thread(target=killer, daemon=True)
t.start()

wrapped = batch.mapInPandas(hold_first_attempt, schema=batch.schema)
BS.probe_and_ingest(spark, store, wrapped, "doc_id", "text",
                    out_dir, threshold=THRESH, batch_id=0)
t.join(timeout=10)

assert "pid" in killed, "no executor was killed — test proved nothing"
got = pairs_of(out_dir)
assert got == expected, "post-kill pairs != oracle: %r vs %r" % (got, expected)
# the kill was real: that JVM is gone
assert not os.path.exists("/proc/%d/cmdline" % killed["pid"]) or \
    "CoarseGrainedExecutorBackend" not in open(
        "/proc/%d/cmdline" % killed["pid"], "rb").read().decode(
            errors="replace")
print("EXECUTOR-KILL-OK pid=%d" % killed["pid"])
spark.stop()
"""


def test_executor_jvm_kill_mid_ingest_recovers(tmp_path):
    """The reference's `sim failtest` discipline (mp3/src/monitor.go:
    78-97) literally: run the band-store ingest on a REAL two-executor
    local-cluster, SIGKILL the executor JVM that is executing the
    batch's first task (its pid is discovered from inside the task via
    /proc and held open with a sleep), and assert Spark's executor-loss
    recovery — task rescheduling, cache-partition recompute via
    lineage, stage resubmission for lost shuffle output — still yields
    pairs identical to a clean run."""
    import os

    import distributed_computing_projects_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    script = _KILL_SCRIPT.replace("@REPO@", repo).replace("@TMP@", str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "EXECUTOR-KILL-OK" in proc.stdout
