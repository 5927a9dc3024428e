"""Cost attribution for the SCALE `avro_events_roundtrip` row — the
condorcet-style stage decomposition (round 13, `6461359`) applied to
the one reader whose 100x point looked heavy (176.6 s r13).

The query is a fixture ROUND-TRIP, so its wall-clock is four stages
with very different 100 TB relevance:

  1. stage_write    — Spark writes the scaled events table as JSONL
                      (fixture-only; a real landing zone already has
                      the .avro files)
  2. driver_parse   — json.loads of the staged shards on the driver
                      (fixture-only)
  3. driver_encode  — the pure-Python OCF ENCODE, one shard per
                      codec on the driver, single-threaded
                      (fixture-only; real writers are upstream)
  4. scan_decode    — binaryFile scan + block decompress + zigzag
                      record decode inside the Arrow workers, then
                      the fact aggregate (the ONLY stage a user of
                      read_avro pays)

plus a single-threaded one-shard split of stage 4's Python work into
block DECOMPRESS vs record DECODE, so the convert-once-to-parquet
claim (sources/avro.py:41-46) is a measured number: decode-once cost
vs what every later query saves by reading parquet instead.

Usage: python tools/avro_attribution.py [factor]   (default 100)
Prints one JSON line; prose lives in SCALE.md.
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
    spark = get_spark(app_name="avro-attribution", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.queries.ext_pipeline import (
        _AVRO_EVENTS_SCHEMA,
        _avro_events_facts,
    )
    from distributed_computing_projects_spark.sources import avro as AV
    from tools.scale_stress import build_stressed

    work = tempfile.mkdtemp(prefix=f"avro-attr-{factor}x-")
    out = {"factor": factor}
    try:
        build_stressed(spark, factor, work)

        # stage 1: Spark JSONL stage write (fixture-only)
        stage = os.path.join(work, "stage")
        t0 = time.monotonic()
        (
            spark.read.parquet(os.path.join(work, "events.parquet"))
            .select("event_id", "user_id", "event_type", "value",
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    .alias("ts"))
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
                                   for ln in f.read().splitlines() if ln])
        out["driver_parse_s"] = round(time.monotonic() - t0, 3)
        out["n_records"] = sum(len(s) for s in shards)

        # stage 3: driver-side single-threaded OCF encode (fixture-only)
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        codecs = ["deflate", "zstandard", "xz", "null", "snappy"]
        t0 = time.monotonic()
        for i, recs in enumerate(shards):
            with open(os.path.join(landing, f"part-{i}.avro"), "wb") as f:
                f.write(AV.write_ocf(recs, _AVRO_EVENTS_SCHEMA,
                                     codec=codecs[i % len(codecs)]))
        out["driver_encode_s"] = round(time.monotonic() - t0, 3)
        del shards

        # stage 4: the only stage a read_avro USER pays — parallel
        # scan + decode + fact aggregate (min of 2, cache cleared)
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            _avro_events_facts(
                AV.read_avro(spark, landing, _AVRO_EVENTS_SCHEMA)).count()
            best = min(best, time.monotonic() - t0)
        out["scan_decode_s"] = round(best, 3)

        # one-shard single-threaded split: block decompress vs record
        # decode (the Python cost inside stage 4's workers)
        shard = open(os.path.join(landing, "part-0.avro"), "rb").read()
        schema, codec, sync, pos = AV.parse_header(shard)
        t0 = time.monotonic()
        blocks = []
        r = AV._Reader(shard)
        r.pos = pos
        while r.pos < r.end:
            try:
                count = r.long()
                size = r.long()
                raw = r.raw(size)
                if r.raw(16) != sync:
                    break
            except (EOFError, ValueError):
                break
            blocks.append((count, AV._decompress_block(codec, raw)))
        out["one_shard_decompress_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        n = 0
        for count, plain in blocks:
            br = AV._Reader(plain)
            for _ in range(count):
                AV._decode_value(br, schema)
                n += 1
        out["one_shard_record_decode_s"] = round(time.monotonic() - t0, 3)
        out["one_shard_records"] = n

        total = (out["stage_write_s"] + out["driver_parse_s"]
                 + out["driver_encode_s"] + out["scan_decode_s"])
        out["fixture_share"] = round(1 - out["scan_decode_s"] / total, 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
