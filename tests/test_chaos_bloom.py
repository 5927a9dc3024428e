"""Chaos test for the streaming bloom-store ingest: a foreachBatch
crash AFTER the batch's masks commit, then a checkpoint restart that
re-runs the same batch_id — the at-least-once double-append the store
must absorb. The band/IVF stores survive this via batch-id overwrite
discipline (tests/test_chaos_ingest.py); the bloom store must survive
it with NO discipline at all, because BIT_OR is idempotent — this test
is the proof that claim holds under a real crashed-and-restarted
query, not just a polite duplicate append.

Runs in a subprocess so the crash can kill an isolated session."""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import os, shutil, sys
sys.path.insert(0, "@REPO@")
os.environ["PYTHONPATH"] = "@REPO@"
from pyspark.sql import SparkSession
from distributed_computing_projects_spark.operators import sketches as SK

work = "@WORK@"
src = os.path.join(work, "src")
store = os.path.join(work, "bloom")
ckpt = os.path.join(work, "ckpt")

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .appName("bloom-chaos").getOrCreate())

os.makedirs(src, exist_ok=True)
a = spark.createDataFrame([(f"a-{i}",) for i in range(200)], ["gram"])
b = spark.createDataFrame([(f"b-{i}",) for i in range(200)], ["gram"])
a.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "f0"))
b.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "f1"))

stream = (spark.readStream.schema(a.schema)
          .option("maxFilesPerTrigger", "1").parquet(src + "/*"))

crashed = {"done": False}

def ingest_crashing(batch_df, batch_id):
    SK.append_batch_bloom(batch_df, store, batch_id=batch_id)
    if batch_id == 0 and not os.path.exists(os.path.join(work, "crashed")):
        open(os.path.join(work, "crashed"), "w").write("x")
        raise RuntimeError("post-commit crash")  # batch 0 re-runs

q = (stream.writeStream.foreachBatch(ingest_crashing)
     .option("checkpointLocation", ckpt).trigger(availableNow=True)
     .start())
try:
    q.awaitTermination(120)
except Exception:
    pass  # the injected crash

# restart from the SAME checkpoint: batch 0 re-runs (duplicate append)
q2 = (stream.writeStream.foreachBatch(
        lambda df, bid: SK.append_batch_bloom(df, store, batch_id=bid))
      .option("checkpointLocation", ckpt).trigger(availableNow=True)
      .start())
assert q2.awaitTermination(120), "restart did not drain"

merged = {(r["word"], r["mask"])
          for r in SK.merged_store_bloom(spark, store).collect()}
direct = {(r["word"], r["mask"])
          for r in SK.bloom_bits(a.unionByName(b)).collect()}
assert merged == direct, (len(merged), len(direct))
# the store REALLY holds a duplicate epoch (the crash wasn't a no-op)
n_epochs = (spark.read.parquet(store)
            .select("batch_id").groupBy("batch_id").count()
            .collect())
assert any(True for _ in n_epochs)
raw = spark.read.parquet(store).count()
assert raw > len(direct), "no duplicate rows: the crash path never ran"
print("BLOOM-CHAOS-OK")
spark.stop()
"""


def test_bloom_store_survives_post_commit_crash_and_replay(tmp_path):
    script = _SCRIPT.replace("@REPO@", "/root/repo").replace(
        "@WORK@", str(tmp_path)
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420,
    )
    assert "BLOOM-CHAOS-OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-3000:]
    )
