"""Structured Streaming entries for the driver's correctness matrix
(SURVEY §2.9 / §7.1 M7 — the reference is strictly batch; streaming is
a labeled engine extension).

Each query here REALLY runs a stream: ``readStream`` over the events
parquet, micro-batches drained with ``availableNow`` into a memory
sink, and the sink table returned as the result DataFrame. For the
windowed aggregation the oracle is plain SQL — batch and streaming
tumbling windows must agree exactly (the differential idea the
reference itself used engine-vs-Hadoop, SURVEY §5.1). The custom
stateful operator is non-SQL-expressible (rows-only check).

Scale notes: the memory sink is harness-only — production drains to
the catalog sinks in streaming/sinks.py (append parquet / snapshot).
State stays bounded via watermarks; ``availableNow`` is the batch
backfill trigger, the same code runs continuously on a live source.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from distributed_computing_projects_spark.queries import query
from distributed_computing_projects_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    running_user_totals,
    tumbling_counts,
)

_SUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE)"


@contextmanager
def _state_partitions(spark, n: int = 32):
    """Pin ``spark.sql.shuffle.partitions`` while a streaming query
    STARTS (the stateful operator fixes its state-store partition count
    from this conf at query start, and a foreign session's default of
    200 means 200 state stores × Arrow python workers for a sf0.01
    drain — measured 12 s vs ~4 s at 32). Restored afterwards so a
    host harness session is left untouched; results are exact under
    any partition count."""
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


@query(
    "streaming_events_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           count(*) AS n, {_SUM_VALUE} AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour windows computed by an actual Structured "
        "Streaming query (readStream -> withWatermark -> window agg -> "
        "availableNow drain); must hash-match the batch SQL oracle.",
)
def q_streaming_events_hourly(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_counts(stream, width="1 hour", watermark="2 hours")
    with _state_partitions(spark):
        run_to_memory_sink(agg, "q_stream_events_hourly", "complete")
    return spark.table("q_stream_events_hourly")


@query(
    "streaming_user_running_totals",
    oracle=None,  # applyInPandasWithState: genuinely non-SQL-expressible
    doc="Custom stateful streaming operator (applyInPandasWithState): "
        "running per-user count+value totals. The events table arrives "
        "as one availableNow batch here, so the update-mode output is "
        "one row per user; rows-only driver check, exact totals pinned "
        "by tests/test_streaming.py.",
)
def q_streaming_user_running_totals(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    totals = running_user_totals(stream)
    with _state_partitions(spark):
        run_to_memory_sink(totals, "q_stream_user_totals", "update")
    # value sums are float-accumulated inside the stateful op; round to
    # cents for a stable cross-run hash (driver does rows+schema only,
    # but determinism costs nothing)
    return (
        spark.table("q_stream_user_totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max("total_value"), 2).alias("total_value"),
        )
    )
