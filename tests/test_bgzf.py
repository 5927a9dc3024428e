"""BGZF splittable gzip (sources/bgzf.py): member-header parsing,
the driver-side member hop, split-protocol reuse (exactly-once lines
with mid-line member cuts through the SHARED zstdseek walker),
gzip-compatibility of the writer, fallbacks, and Spark intra-file
parallelism."""

from __future__ import annotations

import gzip
import os
import struct
import zlib

import pytest

import distributed_computing_projects_spark.sources.bgzf as BG
import distributed_computing_projects_spark.sources.zstdseek as ZS
from distributed_computing_projects_spark.sources.bgzf import (
    _EOF_MEMBER,
    _member,
    bgzf_lines,
    plan_splits,
    walk_members,
    write_bgzf,
)

LINES = [f"line-{i}-" + "q" * (i % 53) for i in range(6000)]
DATA = ("\n".join(LINES) + "\n").encode()


def _collect(path, target):
    got = []
    with open(path, "rb") as f:
        for sp in plan_splits([path], target_bytes=target):
            assert not sp["streaming"]
            got.extend(ln.decode() for ln in ZS.split_lines(
                f, sp, BG._gzip_decompressor))
    return got


def test_writer_is_valid_gzip():
    """Any plain gzip reader must decode the whole BGZF file — that
    is the format's contract (bgzip output IS gzip)."""
    assert gzip.decompress(write_bgzf(DATA, member_bytes=1 << 10)) \
        == DATA


def test_member_header_parses_and_caps():
    m = _member(b"payload")
    assert BG._member_size(m[:BG._HDR + 8]) == len(m)
    with pytest.raises(ValueError):
        _member(b"x" * (BG.MEMBER_CAP + 1))
    # plain gzip header (no FEXTRA) is not a BGZF member
    assert BG._member_size(gzip.compress(b"x")[:18]) is None


def test_eof_marker_is_spec_exact():
    assert len(_EOF_MEMBER) == 28
    assert BG._member_size(_EOF_MEMBER) == 28
    assert zlib.decompressobj(31).decompress(_EOF_MEMBER) == b""


def test_member_hop(tmp_path):
    p = tmp_path / "a.gz"
    p.write_bytes(write_bgzf(DATA, member_bytes=1 << 10))
    offsets, end = walk_members(str(p))
    assert offsets is not None and end == os.path.getsize(p)
    assert offsets[0] == 0 and len(offsets) > 200


@pytest.mark.parametrize("target", [1 << 11, 1 << 14, 1 << 30])
def test_split_union_is_exactly_once(tmp_path, target):
    """Members cut every 1 KiB mid-line; the SHARED ownership walker
    must neither lose nor duplicate a boundary line at any target."""
    p = tmp_path / "a.gz"
    p.write_bytes(write_bgzf(DATA, member_bytes=1 << 10))
    assert _collect(str(p), target) == LINES


def test_unterminated_final_line_emits(tmp_path):
    p = tmp_path / "a.gz"
    p.write_bytes(write_bgzf(DATA[:-1], member_bytes=1 << 10))
    assert _collect(str(p), 1 << 12) == LINES


def test_broken_chain_streams_whole_file(tmp_path):
    """A torn tail or a mid-file corruption must NOT split — a line
    could span the break — but the streaming walk still reads the
    complete lines (concatenated-member gzip semantics)."""
    blob = write_bgzf(DATA, member_bytes=1 << 10)
    for name, mut in (("torn.gz", blob[: len(blob) // 2]),
                      ("plain.gz", gzip.compress(DATA))):
        p = tmp_path / name
        p.write_bytes(mut)
        sp = plan_splits([str(p)], 1 << 11)
        assert len(sp) == 1 and sp[0]["streaming"], name


def test_corrupt_bsize_rejects_chain(tmp_path):
    """A BSIZE that points past EOF must stop the hop (and stream),
    never mis-slice members."""
    blob = bytearray(write_bgzf(DATA, member_bytes=1 << 10))
    offsets, _ = None, None
    # corrupt the 50th member's BSIZE field (offset 16 into header)
    import distributed_computing_projects_spark.sources.bgzf as B

    p = tmp_path / "ok.gz"
    p.write_bytes(bytes(blob))
    offs, _end = walk_members(str(p))
    struct.pack_into("<H", blob, offs[50] + 16, 0xFFFF)
    p2 = tmp_path / "bad.gz"
    p2.write_bytes(bytes(blob))
    sp = plan_splits([str(p2)], 1 << 11)
    assert len(sp) == 1 and sp[0]["streaming"]


def test_spark_intra_file_parallelism(spark, tmp_path):
    p = tmp_path / "one.jsonl.gz"
    data = ("\n".join(f'{{"id": {i}}}' for i in range(20000)) + "\n")
    p.write_bytes(write_bgzf(data.encode(), member_bytes=1 << 12))
    lines = bgzf_lines(spark, str(p), target_bytes=1 << 14)
    assert lines.rdd.getNumPartitions() > 4
    assert lines.count() == 20000


def test_spark_read_jsonl_mixed_landing(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from distributed_computing_projects_spark.sources.bgzf import (
        read_jsonl_bgzf,
    )

    (tmp_path / "b.jsonl.gz").write_bytes(write_bgzf(
        ("\n".join(f'{{"id": {i}}}' for i in range(500)) + "\n"
         ).encode(), member_bytes=1 << 10))
    (tmp_path / "plain.jsonl.gz").write_bytes(gzip.compress(
        b'{"id": 500}\nnot json\n{"id": 501}\n'))
    df = read_jsonl_bgzf(
        spark, str(tmp_path),
        StructType([StructField("id", LongType())]),
        target_bytes=1 << 12)
    assert sorted(r.id for r in df.collect()) == list(range(502))
