"""Seekable-zstd splittable ingest (sources/zstdseek.py): seek-table
parse/validation, the Hadoop split protocol in decompressed
coordinates (exactly-once lines across splits with mid-line frame
cuts), torn-frame and fallback behavior, and REAL intra-file task
parallelism through Spark."""

from __future__ import annotations

import os
import struct

import pytest

import distributed_computing_projects_spark.sources.zstdseek as ZS
from distributed_computing_projects_spark.sources.warc import zstd_backend
from distributed_computing_projects_spark.sources.zstdseek import (
    parse_seek_table,
    plan_splits,
    read_seek_table,
    seekable_lines,
    split_lines,
    write_seekable,
)

pytestmark = pytest.mark.skipif(
    zstd_backend() is None, reason="no zstd backend in this container")


LINES = [f"line-{i}-" + "x" * (i % 41) for i in range(4000)]
DATA = ("\n".join(LINES) + "\n").encode()


def _collect(path, target):
    new_d = zstd_backend()[1]
    got = []
    with open(path, "rb") as f:
        for sp in plan_splits([path], target_bytes=target):
            assert not sp["streaming"]
            got.extend(ln.decode() for ln in split_lines(f, sp, new_d))
    return got


def test_seek_table_roundtrip(tmp_path):
    p = tmp_path / "a.zst"
    p.write_bytes(write_seekable(DATA, frame_bytes=1 << 10))
    entries = read_seek_table(str(p))
    assert entries is not None
    assert sum(d for _, _, d in entries) == len(DATA)
    # frames exactly fill the pre-table region
    last = entries[-1]
    assert last[0] + last[1] < os.path.getsize(p)


@pytest.mark.parametrize("target", [1 << 9, 1 << 12, 1 << 15, 1 << 30])
def test_split_union_is_exactly_once(tmp_path, target):
    """Frames cut mid-line every 1 KiB; any skip/extend off-by-one
    duplicates or loses a boundary line at SOME split size."""
    p = tmp_path / "a.zst"
    p.write_bytes(write_seekable(DATA, frame_bytes=1 << 10))
    assert _collect(str(p), target) == LINES


def test_unterminated_final_line_emits(tmp_path):
    p = tmp_path / "a.zst"
    p.write_bytes(write_seekable(DATA[:-1], frame_bytes=1 << 10))
    assert _collect(str(p), 1 << 12) == LINES


def test_randomized_frame_and_line_shapes(tmp_path):
    """Deterministic pseudo-random line lengths (incl. empty lines
    and lines far longer than a frame) across several frame/target
    combos — the property the protocol must hold universally."""
    seed = 0x2545F4914F6CDD1D
    lens, s = [], seed
    for _ in range(300):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        lens.append(s % 700)  # lines up to ~3 frames long
    lines = ["y" * n for n in lens]
    data = ("\n".join(lines) + "\n").encode()
    for fb, tg in [(256, 256), (256, 1 << 11), (1 << 11, 300)]:
        p = tmp_path / f"r{fb}_{tg}.zst"
        p.write_bytes(write_seekable(data, frame_bytes=fb))
        assert _collect(str(p), tg) == lines, (fb, tg)


def test_invalid_tables_fall_back_to_streaming(tmp_path):
    good = write_seekable(DATA, frame_bytes=1 << 10)
    (n_frames,) = struct.unpack_from("<I", good, len(good) - 9)
    table = n_frames * 8 + 9 + 8
    base = len(good) - table
    bad_size = bytearray(good)
    struct.pack_into("<I", bad_size, base + 4, 7)  # skippable size lies
    cases = {
        "no_table.zst": zstd_backend()[0](DATA),
        "bad_magic.zst": good[:-4] + b"\x00\x00\x00\x00",
        "bad_skip_size.zst": bytes(bad_size),
        "truncated.zst": good[: len(good) // 2],
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        sp = plan_splits([str(p)])
        assert len(sp) == 1 and sp[0]["streaming"], name


def test_frame_region_mismatch_rejected(tmp_path):
    """A table whose compressed sizes do not exactly fill the
    pre-table bytes must be rejected (mis-slicing guard)."""
    good = write_seekable(DATA, frame_bytes=1 << 10)
    blob = b"\x00" * 16 + good  # shift every frame offset by 16
    p = tmp_path / "shift.zst"
    p.write_bytes(blob)
    assert read_seek_table(str(p)) is None


def test_torn_frame_keeps_lines_before(tmp_path):
    """Corrupt ONE mid-file frame: its split keeps complete lines
    decoded before the tear; other splits still extract fully."""
    blob = bytearray(write_seekable(DATA, frame_bytes=1 << 10))
    entries = parse_seek_table(bytes(blob), len(blob))
    victim = entries[len(entries) // 2]
    blob[victim[0] + 8] ^= 0xFF  # flip a byte inside the frame body
    p = tmp_path / "torn.zst"
    p.write_bytes(bytes(blob))
    got = _collect(str(p), 1 << 12)
    assert 0 < len(got) < len(LINES)
    assert not set(got) - set(LINES)  # never invents or duplicates
    assert len(got) == len(set(got))


def test_spark_intra_file_parallelism(spark, tmp_path):
    """THE scale property: one file, many tasks. The lines stage must
    carry more than one partition for a single seekable file."""
    p = tmp_path / "one.jsonl.zst"
    data = ("\n".join(f'{{"id": {i}}}' for i in range(20000)) + "\n")
    p.write_bytes(write_seekable(data.encode(), frame_bytes=1 << 12))
    lines = seekable_lines(spark, str(p), target_bytes=1 << 14)
    n_parts = lines.rdd.getNumPartitions()
    assert n_parts > 4, n_parts
    assert lines.count() == 20000


def test_sink_roundtrip_and_atomicity(spark, tmp_path):
    """The distributed sink writes one seekable shard per non-empty
    partition (atomic rename: no .tmp files survive), each carrying
    a valid seek table, and the splittable reader round-trips the
    rows exactly."""
    from distributed_computing_projects_spark.sources.zstdseek import (
        write_jsonl_seekable,
    )

    df = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(5000)], "id bigint, s string")
    out = tmp_path / "out"
    n = write_jsonl_seekable(df.repartition(3), str(out),
                             frame_bytes=1 << 10)
    assert n == 3
    files = sorted(os.listdir(out))
    assert files == [f"part-{i:05d}.jsonl.zst" for i in range(3)]
    assert not any(".tmp" in f for f in files)
    for f in files:
        entries = read_seek_table(str(out / f))
        assert entries is not None and len(entries) > 1
    lines = seekable_lines(spark, str(out), target_bytes=1 << 12)
    assert lines.count() == 5000
    got = sorted(int(v.split('"id":')[1].split(",")[0].strip("} "))
                 for v in (r.value for r in lines.collect()))
    assert got == list(range(5000))


def test_sink_skips_empty_partitions(spark, tmp_path):
    from distributed_computing_projects_spark.sources.zstdseek import (
        write_jsonl_seekable,
    )

    df = spark.createDataFrame([(1,)], "id bigint").repartition(8)
    out = tmp_path / "out"
    n = write_jsonl_seekable(df, str(out), frame_bytes=1 << 10)
    assert n == 1 and len(os.listdir(out)) == 1


def test_spark_read_jsonl_mixed_landing(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from distributed_computing_projects_spark.sources.zstdseek import (
        read_jsonl_zst_seekable,
    )

    (tmp_path / "seek.jsonl.zst").write_bytes(write_seekable(
        ("\n".join(f'{{"id": {i}}}' for i in range(500)) + "\n"
         ).encode(), frame_bytes=1 << 10))
    (tmp_path / "plain.jsonl.zst").write_bytes(zstd_backend()[0](
        b'{"id": 500}\nnot json\n{"id": 501}\n'))
    df = read_jsonl_zst_seekable(
        spark, str(tmp_path), StructType([StructField("id", LongType())]),
        target_bytes=1 << 12)
    assert sorted(r.id for r in df.collect()) == list(range(502))
