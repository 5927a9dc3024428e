"""Structured Streaming over the ``events`` table (SURVEY.md §2.9/§7.1
M7 — the reference is strictly batch; this is a labeled extension).

The transformations are written against a plain DataFrame, so the SAME
function builds both the streaming query (``readStream`` input) and its
batch twin (``spark.read`` input) — batch parity is the test strategy,
mirroring the reference's engine-vs-Hadoop differential idea
(SURVEY.md §5.1).

Scale notes:
- watermarks bound state: every aggregation here takes one so state
  for closed windows is dropped instead of growing without bound;
- window aggs are hash aggs keyed by (window, key) — one shuffle,
  partial aggregation map-side, same plan shape as the batch twin;
- the custom stateful op uses ``applyInPandasWithState`` (Arrow
  batches, state per user_id partition) — the pattern for operators
  watermark+window can't express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under availableNow; a directory of files streams
    incrementally — same code path on a real landing zone).

    Streaming sources cannot infer schemas, so the raw schema comes
    from a batch footer read — under the session's nanosAsLong conf a
    TIMESTAMP(NANOS) ``ts`` arrives as bigint (converted below, same
    as the batch reader), while a plain µs timestamp passes through
    unchanged. A hardcoded Long schema would break on the latter.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(raw_schema)
        # file streams need a directory source; select just the events
        # file(s) from the table dir (a real landing zone would be its
        # own directory of arriving files)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(raw.dtypes).get("ts") == "timestamp_ntz":
        # Naive parquet timestamps read as NTZ under Spark 4's
        # inferTimestampNTZ, but event-time watermarks require LTZ.
        # Session tz is pinned UTC, so the cast is value-identical.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) count + decimal-exact value sum. Works
    on a stream (late rows beyond the watermark dropped, state pruned)
    and on a batch frame (watermark is a no-op)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


# Static event-type dimension for the stream-static enrichment join.
# One (event_type, category) row per type the generator emits; a real
# pipeline would load this from a catalog table.
EVENT_CATEGORIES: list[tuple[str, str]] = [
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "ops"),
]


def enrich_with_static(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static inner join: enrich each streamed event with a
    static dimension row. Stateless — no watermark, no state store;
    the static side is re-planned each micro-batch and explicitly
    broadcast (a few rows of dimension data vs an unbounded stream:
    broadcast is the only sane side at any scale). The canonical
    lookup-table enrichment shape."""
    return stream.join(F.broadcast(dim), "event_type", "inner")


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts: each row lands in width/slide
    overlapping windows (Spark expands them without data duplication
    in the shuffle beyond the window column)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows with a 30-min inactivity gap —
    ``session_window`` on streams; the batch twin of the lag/cumsum
    sessionization in queries/relational.py (user_sessions)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key in the state store
    only until the watermark passes its event time, so at 100 TB/day
    state is proportional to the watermark horizon, not the stream's
    lifetime (plain ``dropDuplicates`` on a stream grows forever).

    Guarantee within that horizon: exactly-one survivor per key —
    which is the deduplication contract that matters for at-least-once
    sources (Kafka redeliveries, file-landing retries). Batch frames
    fall back to plain dropDuplicates (no watermark semantics needed).
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def interval_join_clicks_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join on user with a time-interval predicate:
    each purchase pairs with every click by the same user in the
    preceding ``horizon``.

    The interval condition is what makes this deployable: it gives the
    engine a provable state bound (a click older than
    ``watermark + horizon`` can never match again and is evicted).
    An equality-only stream-stream join would buffer both streams
    forever. Batch frames take the same code path minus watermarks —
    Catalyst compiles the predicate to an equi-join on user_id with a
    range filter.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "click_id", "user_id", "click_ts", "purchase_ts"
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Custom stateful operator: running per-user event count + value
    total, emitted once per micro-batch per updated user.

    ``applyInPandasWithState`` = Arrow-batched groups + explicit state,
    the escape hatch for semantics watermark+window can't express
    (counters, ML feature state, CDC merges).

    State lifetime: with the default ``state_ttl_ms=None`` state is
    kept forever (NoTimeout) — exact totals for bounded replays, but
    unbounded state on a continuous stream. Pass a TTL to evict a
    user's counters after that much processing-time idleness; a user
    who reappears later restarts from zero. At 100 TB/day the TTL
    form is the only deployable one.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    drain: str = "availableNow",
    max_wait_s: float = 180.0,
) -> None:
    """Drain a stream into an in-memory table (test harness; production
    sinks are parquet/kafka writeStream).

    ``drain='availableNow'`` runs a self-terminating bounded replay —
    the default. ``drain='untilIdle'`` starts a continuous query, polls
    progress until a micro-batch with ``numInputRows == 0`` commits
    (proof every currently-available source row has been absorbed),
    then stops it.

    The second form exists because a stateful operator with
    ProcessingTimeTimeout reports ``shouldRunAnotherBatch=true``
    forever (processing time always advances, so a timeout could
    always fire next batch). That makes BOTH standard bounded drains
    hang: availableNow keeps constructing empty micro-batches until
    the TTL actually fires (hour-scale), and ``processAllAvailable()``
    blocks on the engine's ``noNewData`` flag, which is only raised
    when the engine decides NOT to construct a batch — which it never
    does here. An observed empty batch is the one signal that doesn't
    depend on the engine idling.
    """
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
    )
    if drain == "availableNow":
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    elif drain == "untilIdle":
        import time as _time

        q = writer.start()
        try:
            deadline = _time.monotonic() + max_wait_s
            drained = False
            while _time.monotonic() < deadline:
                for p in q.recentProgress:
                    rows = p["numInputRows"] if isinstance(p, dict) else p.numInputRows
                    if rows == 0:
                        drained = True
                        break
                if drained or q.exception() is not None:
                    break
                _time.sleep(0.25)
            if q.exception() is not None:
                raise q.exception()
            if not drained:
                raise TimeoutError(
                    f"stream {name!r} saw no empty micro-batch in {max_wait_s}s"
                )
        finally:
            q.stop()
        q.awaitTermination()
    else:
        raise ValueError(
            f"drain must be 'availableNow' or 'untilIdle', got {drain!r}"
        )
