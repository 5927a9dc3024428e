"""Arrow IPC source (sources/arrowipc.py): both framings through one
walker, the zip-shaped torn-footer fallback, batch-granular bomb
bounds, reader-schema column selection, and the Spark read path."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.arrowipc as AI
from distributed_computing_projects_spark.sources.arrowipc import (
    build_ipc,
    iter_batches,
    read_arrow_ipc,
)

ROWS = {"a": list(range(10_000)),
        "b": [f"s{i}" for i in range(10_000)]}


@pytest.mark.parametrize("framing", ["file", "stream"])
def test_roundtrip_both_framings(framing):
    data = build_ipc(ROWS, framing)
    got_a, got_b = [], []
    for batch in iter_batches(data):
        pdf = batch.to_pandas()
        got_a += list(pdf["a"])
        got_b += list(pdf["b"])
    assert got_a == ROWS["a"] and got_b == ROWS["b"]


def test_file_framing_magic_present():
    assert build_ipc(ROWS, "file")[:6] == AI.MAGIC
    assert build_ipc(ROWS, "stream")[:6] != AI.MAGIC


@pytest.mark.parametrize("framing", ["file", "stream"])
def test_torn_tail_keeps_complete_batches(framing):
    """File framing: the footer (the source of truth, at the END —
    the zip central-directory shape) is gone, so the walker must fall
    back to the embedded message stream."""
    data = build_ipc(ROWS, framing)
    kept = sum(b.num_rows for b in iter_batches(data[:int(len(data) * .6)]))
    assert 0 < kept < 10_000 and kept % 4096 == 0


def test_junk_and_empty_yield_nothing():
    assert list(iter_batches(b"not arrow at all")) == []
    assert list(iter_batches(b"")) == []
    assert list(iter_batches(b"ARROW1\x00\x00garbage")) == []


def test_bomb_batch_drops_with_everything_after(monkeypatch):
    monkeypatch.setattr(AI, "MAX_BATCH_ROWS", 4096)
    small = {"a": list(range(100))}
    big = {"a": list(range(5000))}
    for framing in ("file", "stream"):
        # one over-bound 5000-row batch, then a small one: the bomb
        # batch AND everything after it must drop
        data = build_ipc(big, framing, max_chunksize=10_000)
        assert list(iter_batches(data)) == []
        assert sum(b.num_rows
                   for b in iter_batches(build_ipc(small, framing))) == 100


def test_reader_schema_selects_by_name(spark, tmp_path):
    """Writer-only columns discard; reader-only columns null — one
    scan spans shard generations (the avro resolution discipline)."""
    (tmp_path / "g1.arrow").write_bytes(build_ipc(
        {"a": [1, 2], "extra": ["x", "y"]}, "file"))
    (tmp_path / "g2.arrow").write_bytes(build_ipc(
        {"a": [3], "c": [9.5]}, "stream"))
    (tmp_path / "junk.arrow").write_bytes(b"junk")
    df = read_arrow_ipc(spark, str(tmp_path), "a bigint, c double")
    rows = {r.a: r.c for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 9.5}
    assert df.columns == ["a", "c"]


def test_type_drift_coerces_per_cell(spark, tmp_path):
    """A shard whose column TYPE drifted across generations (string
    vs double, numeric-as-string) must coerce / null per cell like
    the avro and xlsx adapters — not kill the task in Spark's Arrow
    serializer."""
    (tmp_path / "g1.arrow").write_bytes(build_ipc(
        {"a": [1, 2], "v": [1.5, 2.5]}, "file"))
    # drifted generation: a became string, v became string-of-number
    (tmp_path / "g2.arrow").write_bytes(build_ipc(
        {"a": ["3", "oops"], "v": ["9.5", "bad"]}, "stream"))
    df = read_arrow_ipc(spark, str(tmp_path), "a bigint, v double")
    rows = sorted(((r.a, r.v) for r in df.collect()),
                  key=lambda t: (t[0] is None, t[0]))
    assert rows == [(1, 1.5), (2, 2.5), (3, 9.5), (None, None)]


def test_timestamp_tz_drift_coerces(spark, tmp_path):
    """tz-aware vs naive timestamp drift: both generations land as
    INSTANT values instead of failing the serializer."""
    import datetime as dt

    import pyarrow as pa

    aware = [dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)]
    naive = [dt.datetime(2026, 1, 2)]
    (tmp_path / "g1.arrow").write_bytes(build_ipc(
        {"t": pa.array(aware, pa.timestamp("us", "UTC"))}, "file"))
    (tmp_path / "g2.arrow").write_bytes(build_ipc(
        {"t": pa.array(naive, pa.timestamp("us"))}, "stream"))
    df = read_arrow_ipc(spark, str(tmp_path), "t timestamp")
    days = sorted(r.t.day for r in df.collect())
    assert days == [1, 2]


def test_spark_read_path_mixed_framings(spark, tmp_path):
    (tmp_path / "p1.arrow").write_bytes(build_ipc(
        {"a": list(range(100))}, "file"))
    (tmp_path / "p2.arrow").write_bytes(build_ipc(
        {"a": list(range(100, 250))}, "stream"))
    df = read_arrow_ipc(spark, str(tmp_path), "a bigint")
    assert sorted(r.a for r in df.collect()) == list(range(250))


def test_nested_ddl_column_names_parse(spark, tmp_path):
    """DDL name extraction must survive nested types whose commas a
    naive split would trip on."""
    import pyarrow as pa

    (tmp_path / "n.arrow").write_bytes(build_ipc(
        {"a": [1],
         "m": pa.array([[("k", 2)]], pa.map_(pa.string(), pa.int64()))},
        "file"))
    df = read_arrow_ipc(spark, str(tmp_path), "a bigint, m map<string,bigint>")
    rows = df.collect()
    assert rows[0].a == 1 and dict(rows[0].m) == {"k": 2}
