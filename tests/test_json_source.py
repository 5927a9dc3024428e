"""JSONL source: malformed-record policies over the checked-in fixture
(fixtures/events_jsonl — 11 well-formed records interleaved with a
truncated object, bare garbage, a non-object JSON line, and a blank
line across two files)."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError

from distributed_computing_projects_spark.queries.ext_pipeline import (
    _JSONL_DIR,
    JSONL_EVENTS_SCHEMA,
)
from distributed_computing_projects_spark.sources.json import read_jsonl

GLOB = f"{_JSONL_DIR}/*.jsonl"


def test_drop_skips_exactly_the_malformed_lines(spark):
    df = read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA)
    ids = sorted(r.event_id for r in df.collect())
    # event_id 4 is the truncated object — its line must NOT survive
    assert ids == [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12]
    assert "_corrupt_record" not in df.columns


def test_missing_field_is_null_not_dropped(spark):
    """A well-formed object missing 'value' keeps its record (field
    null) — only SYNTACTIC failures drop."""
    df = read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA)
    row = df.filter("event_id = 9").collect()[0]
    assert row.value is None and row.event_type == "view"


def test_keep_quarantines_corrupt_lines(spark):
    df = read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA, malformed="keep")
    corrupt = df.filter("_corrupt_record IS NOT NULL")
    assert corrupt.count() == 4
    raws = [r._corrupt_record for r in corrupt.collect()]
    assert "not json at all" in raws
    # quarantined rows carry the raw line and null schema fields
    assert all(r.event_id is None for r in corrupt.collect())
    assert df.filter("_corrupt_record IS NULL").count() == 11


def test_fail_mode_raises_on_malformed(spark):
    df = read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA, malformed="fail")
    with pytest.raises(Py4JJavaError):
        df.collect()


def test_rejects_unknown_policy(spark):
    with pytest.raises(ValueError):
        read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA, malformed="bogus")


def test_stream_agrees_with_batch_record_for_record(spark):
    from distributed_computing_projects_spark.sources.json import (
        read_jsonl_stream,
    )
    from distributed_computing_projects_spark.streaming.windows import (
        run_to_memory_sink,
    )

    stream = read_jsonl_stream(spark, _JSONL_DIR, JSONL_EVENTS_SCHEMA)
    assert stream.isStreaming
    run_to_memory_sink(stream, "t_jsonl_stream", output_mode="append")
    got = sorted(
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in spark.table("t_jsonl_stream").collect()
    )
    want = sorted(
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA).collect()
    )
    assert got == want and len(got) == 11


def test_write_jsonl_roundtrips(spark, tmp_path):
    from distributed_computing_projects_spark.sources.json import write_jsonl

    src = read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA)
    out = str(tmp_path / "out_jsonl")
    write_jsonl(src, out)
    back = spark.read.schema(JSONL_EVENTS_SCHEMA).json(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_gzip_jsonl_reads_transparently(spark, tmp_path):
    """jsonl.gz is the shape event logs actually land in: Spark's
    text scan decompresses by extension (Hadoop codec, JVM-side), so
    the SAME read_jsonl path — including the drop policy — must see
    identical records from a gzipped copy of the fixture. (Gzip is
    not splittable: at 100 TB the parallel unit is the file, same as
    WARC — many files, not split files.)"""
    import glob
    import gzip
    import os

    for src in glob.glob(GLOB):
        with open(src, "rb") as f:
            data = f.read()
        dst = str(tmp_path / (os.path.basename(src) + ".gz"))
        with open(dst, "wb") as f:
            f.write(gzip.compress(data, mtime=0))

    plain = sorted(
        tuple(r) for r in
        read_jsonl(spark, GLOB, JSONL_EVENTS_SCHEMA).collect())
    gz = sorted(
        tuple(r) for r in
        read_jsonl(spark, f"{tmp_path}/*.jsonl.gz",
                   JSONL_EVENTS_SCHEMA).collect())
    assert gz == plain and len(plain) == 11
