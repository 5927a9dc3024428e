"""Watermark semantics test: a multi-batch file stream where a later
micro-batch delivers an event older than the watermark — it must be
DROPPED from the aggregation, while in-order data keeps flowing.

Spark ≥3.4 keeps TWO watermarks per batch (SPARK-39931): state
*eviction* uses the watermark computed from the previous batch's data,
but the *late-event filter* uses the watermark from one batch earlier
still (so multi-stateful-operator pipelines stay deterministic). A
late row is therefore only guaranteed to drop when it arrives ≥2
batches after the data that advanced the watermark past it — the
fixture stages three files to respect that.

Also exercises read-side schema detection: the fixture files store ts
as a normal µs timestamp (not the driver data's TIMESTAMP(NANOS)).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Row, functions as F

from distributed_computing_projects_spark.streaming.windows import tumbling_counts


def _event(i, hour, minute=0, etype="click"):
    return Row(
        event_id=i,
        ts=f"2024-01-01 {hour:02d}:{minute:02d}:00",
        user_id=i % 3,
        event_type=etype,
        value=1.0,
        props="{}",
    )


def _write(spark, rows, path):
    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    land = str(tmp_path / "landing")
    # batch 0: events at 10:00-12:00 -> eviction wm after it = 12:00-2h = 10:00
    _write(spark, [_event(1, 10), _event(2, 11), _event(3, 12)],
           os.path.join(land, "f1.parquet"))
    # batch 1: fresh event at 13:00 (late-filter wm still 0 here)
    time.sleep(1.1)  # file stream orders batches by modification time
    _write(spark, [_event(4, 13)], os.path.join(land, "f2.parquet"))
    # batch 2: late-filter wm = 10:00 -> the 07:30 event (window end
    # 08:00) must be dropped; the 13:30 event still lands
    time.sleep(1.1)
    _write(spark, [_event(5, 7, 30), _event(6, 13, 30)],
           os.path.join(land, "f3.parquet"))

    raw_schema = spark.read.parquet(os.path.join(land, "f1.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land + "/*")
    )
    agg = tumbling_counts(stream, width="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_watermark")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    buckets = {
        r.bucket.strftime("%H:%M"): r.n
        for r in spark.table("t_watermark")
        .groupBy("bucket")
        .agg(F.max("n").alias("n"))
        .collect()
    }
    assert "07:00" not in buckets, f"late event leaked past the watermark: {buckets}"
    assert dropped == 1
    assert buckets.get("13:00") == 2  # fresh late-batch event still lands
    assert buckets.get("10:00") == 1 and buckets.get("11:00") == 1
