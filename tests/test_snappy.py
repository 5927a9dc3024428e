"""Pure-stdlib snappy raw-format codec (functions/snappy.py): spec
vectors, overlap-copy semantics, malformed shapes, the round-trip of
the fixture encoder, and the Avro snappy block integration."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_computing_projects_spark.functions import snappy as SN


def test_literal_only_stream():
    # hand-built: len=5 preamble, literal tag (5-1)<<2, body
    raw = bytes([5, (4 << 2)]) + b"hello"
    assert SN.decompress(raw) == b"hello"


def test_copy_with_overlap_run():
    # "ab" then copy(offset=2, len=6) -> "ab" repeated: abababab
    body = bytes([8, (1 << 2)]) + b"ab" + bytes([((6 - 1) << 2) | 2]) \
        + (2).to_bytes(2, "little")
    assert SN.decompress(body) == b"abababab"


def test_copy1_form():
    # copy with 1-byte offset: tag kind 01, len=((tag>>2)&7)+4
    body = bytes([8, (3 << 2)]) + b"abcd" \
        + bytes([((4 - 4) << 2) | (0 << 5) | 1, 4])
    assert SN.decompress(body) == b"abcdabcd"


@pytest.mark.parametrize("evil", [
    b"",                                 # empty: no preamble
    bytes([5, (4 << 2)]) + b"hi",        # literal body past end
    bytes([2, (4 << 2)]) + b"hello",     # output overrun
    bytes([9, (4 << 2)]) + b"hello",     # underrun
    bytes([4, ((4 - 1) << 2) | 2, 9, 0]),  # copy before start
    bytes([255, 255, 255, 255, 255, 255]),  # varint too long
])
def test_malformed_raises(evil):
    with pytest.raises(ValueError):
        SN.decompress(evil)


def test_bound_checked_before_decode():
    big = SN.compress(b"\x00" * 100_000)
    with pytest.raises(ValueError):
        SN.decompress(big, max_length=99_999)
    assert SN.decompress(big, max_length=100_000) == b"\x00" * 100_000


@settings(max_examples=30, deadline=None)
@given(data=st.binary(max_size=3000))
def test_prop_roundtrip(data):
    assert SN.decompress(SN.compress(data)) == data


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_prop_repetitive_roundtrip_uses_copies(seed):
    import random

    rng = random.Random(seed)
    words = [bytes([rng.randrange(97, 103)]) * rng.randrange(1, 9)
             for _ in range(20)]
    data = b"".join(rng.choice(words) for _ in range(300))
    packed = SN.compress(data)
    assert SN.decompress(packed) == data
    assert len(packed) < len(data)  # copies actually fired


def test_avro_snappy_codec_roundtrip_and_crc_drop():
    from distributed_computing_projects_spark.sources import avro as AV

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    recs = [{"a": i, "b": f"val{i % 7}"} for i in range(500)]
    data = AV.write_ocf(recs, schema, codec="snappy",
                        records_per_block=100)
    assert list(AV.iter_records(data)) == recs
    # flip one byte inside the first block: CRC (or tag stream) must
    # drop that block, later blocks survive
    _, _, _, off = AV.parse_header(data)
    b = bytearray(data)
    b[off + 12] ^= 0xFF
    got = list(AV.iter_records(bytes(b)))
    assert got == recs[100:]
    # CRC itself flipped: decode succeeds, checksum drops the block
    blk0_plain_crc_pos = None  # flip the 4 bytes before block 0's sync
    sync = data[off - 16:off] if False else None
    # simpler: corrupt the LAST byte of the first block payload (the
    # CRC tail) — find block 0 span from its declared size
    r = AV._Reader(data)
    r.pos = off
    r.long()  # count
    size = r.long()
    crc_last = r.pos + size - 1
    b2 = bytearray(data)
    b2[crc_last] ^= 0xFF
    got2 = list(AV.iter_records(bytes(b2)))
    assert got2 == recs[100:]
