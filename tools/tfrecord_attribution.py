"""Cost attribution for the SCALE `tfrecord_scan` row — the avro
decomposition (tools/avro_attribution.py) applied to the round-15
reader whose 100x point is fixture-dominated the same way.

The query is a fixture ROUND-TRIP, so its wall-clock is four stages
with very different 100 TB relevance:

  1. stage_write    — Spark writes the scaled events subset as JSONL
                      (fixture-only)
  2. driver_parse   — json.loads of the staged shards on the driver
                      (fixture-only)
  3. driver_encode  — pure-Python Example encode + CRC-32C framing,
                      single-threaded on the driver (fixture-only;
                      real TFRecord corpora are written upstream by
                      TF/beam pipelines)
  4. scan_decode    — binaryFile scan + frame walk + Example wire
                      decode inside the Arrow workers + the
                      projection count (the ONLY stage a user of
                      read_tfrecord pays)

plus a single-threaded one-shard split of stage 4's Python work into
frame-walk+CRC vs Example DECODE, making the convert-once-to-parquet
claim a measured number here too.

Usage: python tools/tfrecord_attribution.py [factor]   (default 100)
Prints one JSON line; prose lives in SCALE.md (tools/scale_stress.py
_write_md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_computing_projects_spark.session import get_spark  # noqa: E402


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="tfrecord-attribution", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.sources import (
        tfrecord as TFR,
    )
    from tools.scale_stress import build_stressed

    work = tempfile.mkdtemp(prefix=f"tfr-attr-{factor}x-")
    out = {"factor": factor}
    try:
        build_stressed(spark, factor, work)

        # stage 1: Spark JSONL stage write (fixture-only)
        stage = os.path.join(work, "stage")
        t0 = time.monotonic()
        (
            spark.read.parquet(os.path.join(work, "events.parquet"))
            .filter(F.col("event_id") % 3 == 1)
            .select("event_id", "user_id", "event_type", "value")
            .repartition(4)
            .write.json(stage)
        )
        out["stage_write_s"] = round(time.monotonic() - t0, 3)

        # stage 2: driver-side JSON parse (fixture-only)
        shards = []
        t0 = time.monotonic()
        for name in sorted(os.listdir(stage)):
            if name.startswith("part-"):
                with open(os.path.join(stage, name), "rb") as f:
                    shards.append([json.loads(ln)
                                   for ln in f.read().splitlines()
                                   if ln])
        out["driver_parse_s"] = round(time.monotonic() - t0, 3)
        out["n_records"] = sum(len(s) for s in shards)

        # stage 3: driver-side single-threaded Example encode + CRC
        # framing (fixture-only)
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        t0 = time.monotonic()
        for i, recs in enumerate(shards):
            payloads = [TFR.build_example(
                {"event_id": r["event_id"], "user_id": r["user_id"],
                 "event_type": r["event_type"],
                 "value": r.get("value"),
                 "extra_tokens": [r["event_id"] % 7, 1, 2]})
                for r in recs]
            with open(os.path.join(landing, f"part-{i}.tfrecord"),
                      "wb") as f:
                f.write(TFR.build_tfrecord(payloads))
        out["driver_encode_s"] = round(time.monotonic() - t0, 3)
        del shards

        # stage 4: the only stage a read_tfrecord USER pays —
        # parallel scan + frame walk + decode + projection count
        # (min of 2, cache cleared)
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            TFR.read_tfrecord(
                spark, landing,
                "event_id bigint, user_id bigint, event_type string, "
                "value float").count()
            best = min(best, time.monotonic() - t0)
        out["scan_decode_s"] = round(best, 3)

        # one-shard single-threaded split: frame walk + CRC-32C vs
        # Example wire decode (the Python cost inside stage 4)
        shard = open(os.path.join(landing, "part-0.tfrecord"),
                     "rb").read()
        t0 = time.monotonic()
        payloads = list(TFR.iter_tfrecords(shard))
        out["one_shard_frame_crc_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        for p in payloads:
            TFR.parse_example(p)
        out["one_shard_example_decode_s"] = round(
            time.monotonic() - t0, 3)
        out["one_shard_records"] = len(payloads)

        total = (out["stage_write_s"] + out["driver_parse_s"]
                 + out["driver_encode_s"] + out["scan_decode_s"])
        out["fixture_share_pct"] = round(
            100.0 * (total - out["scan_decode_s"]) / total, 1)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
