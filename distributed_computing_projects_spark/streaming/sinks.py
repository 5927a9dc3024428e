"""Streaming sinks: land a stream into the engine catalog.

The reference's only job sink is "concatenate per-key outputs, upload
to SDFS" (CollectJuices, mp3/src/maplejuice.go:540-568). The streaming
equivalent lands micro-batches into a named parquet dataset with
exactly-once file commits + a checkpoint for restart recovery.

Two modes:
- append: direct ``writeStream.format('parquet')`` — scalable default;
- complete_snapshot: ``foreachBatch`` that replaces the dataset
  atomically per micro-batch (for aggregates in complete mode, where
  the parquet sink can't be used).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from distributed_computing_projects_spark.catalog import Catalog


def stream_append_to_catalog(
    stream_df: DataFrame, catalog: Catalog, name: str, available_now: bool = True
):
    """Append-mode landing: parquet sink + checkpoint under the catalog
    root. File-commit protocol makes each micro-batch all-or-nothing;
    the checkpoint makes restarts resume instead of duplicate."""
    dest = os.path.join(catalog.root, name)
    checkpoint = os.path.join(catalog.root, f".checkpoint-{name}")
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )
    return q


def stream_snapshot_to_catalog(
    stream_df: DataFrame, catalog: Catalog, name: str, available_now: bool = True
):
    """Complete-mode landing for streaming aggregates: every micro-batch
    replaces the named dataset through the catalog's atomic
    write-to-temp + rename commit."""
    checkpoint = os.path.join(catalog.root, f".checkpoint-{name}")

    def land(batch_df: DataFrame, batch_id: int) -> None:
        catalog.put(name, batch_df, mode="overwrite")

    q = (
        stream_df.writeStream.foreachBatch(land)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=available_now)
        .start()
    )
    return q
