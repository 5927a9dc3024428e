"""Streaming extension tests: every windowed transformation is built by
ONE function run against both readStream and spark.read — the test
asserts the streaming result equals the batch result (differential
testing, same strategy as the reference's MapleJuice-vs-Hadoop twins).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_computing_projects_spark.sources.registry import load_table
from distributed_computing_projects_spark.streaming import (
    dedup_within_watermark,
    interval_join_clicks_purchases,
    read_events_stream,
    running_user_totals,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)
from distributed_computing_projects_spark.streaming.windows import run_to_memory_sink


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_tumbling_counts_stream_matches_batch(spark, sf_dir):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    run_to_memory_sink(stream, "t_tumbling")
    got = _sorted_rows(spark.table("t_tumbling"), "bucket", "event_type")
    want = _sorted_rows(
        tumbling_counts(load_table(spark, sf_dir, "events")), "bucket", "event_type"
    )
    assert got == want and len(got) > 0


def test_sliding_counts_stream_matches_batch(spark, sf_dir):
    stream = sliding_counts(read_events_stream(spark, sf_dir))
    run_to_memory_sink(stream, "t_sliding")
    got = _sorted_rows(spark.table("t_sliding"), "w_start", "event_type")
    want = _sorted_rows(
        sliding_counts(load_table(spark, sf_dir, "events")),
        "w_start", "event_type",
    )
    assert got == want
    # every event lands in width/slide = 4 overlapping windows:
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r[3] for r in got) == 4 * n_events


def test_session_aggregate_stream_matches_batch(spark, sf_dir):
    stream = session_aggregate(read_events_stream(spark, sf_dir))
    run_to_memory_sink(stream, "t_sessions")
    got = _sorted_rows(spark.table("t_sessions"), "user_id", "session_start")
    want = _sorted_rows(
        session_aggregate(load_table(spark, sf_dir, "events")),
        "user_id", "session_start",
    )
    assert got == want and len(got) > 0


def test_session_aggregate_agrees_with_lag_cumsum_twin(spark, sf_dir):
    """The streaming session_window and the batch lag/cumsum query
    (user_sessions) must count the same sessions per user."""
    from distributed_computing_projects_spark.queries import load_registry

    sessions = session_aggregate(load_table(spark, sf_dir, "events"))
    by_window = {
        r.user_id: r.n
        for r in sessions.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    by_lag = {
        r.user_id: r.n_sessions
        for r in load_registry()["user_sessions"].fn(spark, sf_dir).collect()
    }
    assert by_window == by_lag


def test_dedup_within_watermark_drops_every_duplicate(spark, sf_dir):
    """events ∪ events through the streaming dedup must equal DISTINCT
    events — exactly one survivor per event_id within the watermark
    horizon (both copies arrive in the same micro-batch here)."""
    dup = read_events_stream(spark, sf_dir).union(
        read_events_stream(spark, sf_dir)
    )
    deduped = dedup_within_watermark(dup, ["event_id"]).select(
        "event_id", "user_id", "value"
    )
    assert deduped.isStreaming
    run_to_memory_sink(deduped, "t_dedup_stream", output_mode="append")
    got = _sorted_rows(spark.table("t_dedup_stream"), "event_id")
    want = _sorted_rows(
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"
        ),
        "event_id",
    )
    assert got == want and len(got) > 0


def test_interval_join_stream_matches_batch(spark, sf_dir):
    """Stream-stream interval join must produce exactly the batch join
    (same operator, watermarks attached) — purchases paired with every
    same-user click in the preceding hour."""
    ev_s = read_events_stream(spark, sf_dir)
    joined = interval_join_clicks_purchases(
        ev_s.filter(F.col("event_type") == "click"),
        ev_s.filter(F.col("event_type") == "purchase"),
    )
    assert joined.isStreaming
    run_to_memory_sink(joined, "t_cp_join", output_mode="append")
    ev_b = load_table(spark, sf_dir, "events")
    want = _sorted_rows(
        interval_join_clicks_purchases(
            ev_b.filter(F.col("event_type") == "click"),
            ev_b.filter(F.col("event_type") == "purchase"),
        ),
        "purchase_id", "click_id",
    )
    got = _sorted_rows(spark.table("t_cp_join"), "purchase_id", "click_id")
    assert got == want and len(got) > 0


def test_running_user_totals_final_state_matches_batch_agg(spark, sf_dir):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    run_to_memory_sink(stream, "t_running", output_mode="update")
    # last update per user == overall totals
    got = {
        r.user_id: (r.n_events, pytest.approx(r.total_value))
        for r in spark.table("t_running")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .withColumnRenamed("max(n_events)", "n_events")
        .collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert {u: v[0] for u, v in got.items()} == {u: v[0] for u, v in want.items()}
    for u in want:
        assert got[u][1] == want[u][1]


def test_running_user_totals_with_state_ttl_matches_on_bounded_replay(
    spark, sf_dir
):
    """The ProcessingTimeTimeout variant (state_ttl_ms set) must agree
    with the NoTimeout variant on a bounded replay whose wall-clock run
    is far shorter than the TTL — evictions change long-horizon memory,
    never short-horizon values."""
    stream = running_user_totals(
        read_events_stream(spark, sf_dir), state_ttl_ms=3_600_000
    )
    # availableNow/processAllAvailable both hang under
    # ProcessingTimeTimeout (shouldRunAnotherBatch is always true);
    # 'untilIdle' stops after the first observed empty micro-batch.
    run_to_memory_sink(
        stream, "t_running_ttl", output_mode="update", drain="untilIdle"
    )
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("t_running_ttl")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert {u: v[0] for u, v in got.items()} == {u: v[0] for u, v in want.items()}
    for u in want:
        assert got[u][1] == pytest.approx(want[u][1])


def test_enrich_with_static_stream_matches_batch(spark, sf_dir):
    from distributed_computing_projects_spark.streaming.windows import (
        EVENT_CATEGORIES,
        enrich_with_static,
    )

    dim = spark.createDataFrame(
        EVENT_CATEGORIES, "event_type string, category string"
    )
    stream = enrich_with_static(read_events_stream(spark, sf_dir), dim)
    assert stream.isStreaming
    agg = stream.groupBy("category").agg(F.count("*").alias("n"))
    run_to_memory_sink(agg, "t_enriched")
    got = _sorted_rows(spark.table("t_enriched"), "category")
    want = _sorted_rows(
        enrich_with_static(load_table(spark, sf_dir, "events"), dim)
        .groupBy("category").agg(F.count("*").alias("n")),
        "category",
    )
    assert got == want and len(got) == 3


def test_streaming_dedup_ingest_matches_batch_incremental(spark, sf_dir):
    """The stream is only the delivery mechanism: foreachBatch probing
    of the band store must produce exactly the batch incremental
    pairs."""
    from distributed_computing_projects_spark.queries import load_registry

    reg = load_registry()
    via_stream = sorted(
        (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
        for r in reg["streaming_dedup_ingest"].fn(spark, sf_dir).collect()
    )
    via_batch = sorted(
        (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
        for r in reg["dedup_incremental"].fn(spark, sf_dir).collect()
    )
    assert via_stream == via_batch
