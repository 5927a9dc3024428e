"""Streaming -> catalog landing tests: append-mode parquet sink and
complete-mode snapshot via foreachBatch, both checkpointed."""

from __future__ import annotations

from distributed_computing_projects_spark.catalog import Catalog
from distributed_computing_projects_spark.sources.registry import load_table
from distributed_computing_projects_spark.streaming import (
    read_events_stream,
    tumbling_counts,
)
from distributed_computing_projects_spark.streaming.sinks import (
    stream_append_to_catalog,
    stream_snapshot_to_catalog,
)


def test_append_stream_lands_all_rows(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    q = stream_append_to_catalog(read_events_stream(spark, sf_dir), cat, "events_raw")
    q.awaitTermination()
    landed = cat.get("events_raw")
    want = load_table(spark, sf_dir, "events")
    assert landed.count() == want.count()
    assert set(landed.columns) == set(want.columns)
    assert "events_raw" in cat.store()


def test_append_stream_restart_does_not_duplicate(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    stream_append_to_catalog(
        read_events_stream(spark, sf_dir), cat, "events_raw"
    ).awaitTermination()
    # same checkpoint, same source: restart finds no new files
    stream_append_to_catalog(
        read_events_stream(spark, sf_dir), cat, "events_raw"
    ).awaitTermination()
    assert cat.get("events_raw").count() == load_table(spark, sf_dir, "events").count()


def test_snapshot_stream_lands_aggregate(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    agg = tumbling_counts(read_events_stream(spark, sf_dir))
    stream_snapshot_to_catalog(agg, cat, "events_hourly").awaitTermination()
    got = {tuple(r) for r in cat.get("events_hourly").collect()}
    want = {
        tuple(r) for r in tumbling_counts(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want and len(got) > 0
