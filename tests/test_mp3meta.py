"""MP3 frame-header scanner: sync walk across versions/layers, frame
size arithmetic, ID3v2/ID3v1 skip, VBR detection, torn-stream and
malformed-drop policy (operators/mp3meta.py)."""

from __future__ import annotations

import pytest

from distributed_computing_projects_spark.operators import mp3meta as MP


def _hdr(version=3, layer_bits=1, br_idx=9, sr_idx=0, padding=0):
    return bytes([
        0xFF,
        0xE0 | (version << 3) | (layer_bits << 1) | 1,
        (br_idx << 4) | (sr_idx << 2) | (padding << 1),
        0x00,
    ])


def _frame(**kw):
    h = _hdr(**kw)
    size = MP._frame_at(h, 0)[0]
    return h + b"\xaa" * (size - 4)


def test_mpeg1_layer3_cbr_stream():
    # idx 10 -> 160 kbps, 44100 Hz, 3 frames
    b = _frame(br_idx=10) * 3
    assert MP.parse_mp3_frames(b) == (3, 160, 44100, 3 * 1152 * 1000 // 44100)


def test_frame_size_arithmetic_padding():
    # MPEG1 L3 at 128 kbps (idx 9)/44100: 417 bytes unpadded, 418 padded
    assert MP._frame_at(_hdr(br_idx=9), 0)[0] == 417
    assert MP._frame_at(_hdr(br_idx=9, padding=1), 0)[0] == 418
    # Layer I (bits 3): (12*bitrate*1000/sr + pad) * 4
    assert MP._frame_at(_hdr(layer_bits=3, br_idx=8), 0) is not None


def test_id3v2_and_id3v1_skipped():
    body = b"\x00" * 13
    tag2 = b"ID3\x04\x00\x00" + b"\x00\x00\x00\x0d" + body
    b = tag2 + _frame(br_idx=10) * 2 + b"TAG" + b"\x00" * 125
    n, br, sr, ms = MP.parse_mp3_frames(b)
    assert (n, br, sr) == (2, 160, 44100)


def test_vbr_reported_as_minus_one():
    b = _frame(br_idx=5) + _frame(br_idx=9)
    assert MP.parse_mp3_frames(b)[1] == -1


def test_mpeg2_layer3_uses_576_samples():
    # version bits 2 = MPEG2; sr idx 0 -> 22050
    b = _frame(version=2, br_idx=5) * 4
    n, _br, sr, ms = MP.parse_mp3_frames(b)
    assert (n, sr) == (4, 22050)
    assert ms == 4 * 576 * 1000 // 22050


def test_torn_and_malformed():
    b = _frame() * 2
    torn = b[:len(b) - 10]  # last frame incomplete
    assert MP.parse_mp3_frames(torn)[0] == 1
    assert MP.parse_mp3_frames(b"not an mp3") is None
    assert MP.parse_mp3_frames(b"") is None
    # free-format (idx 0) and reserved (15) are outside the subset
    assert MP.parse_mp3_frames(_hdr(br_idx=0) + b"\xaa" * 100) is None
    assert MP.parse_mp3_frames(_hdr(br_idx=15) + b"\xaa" * 100) is None


def test_sample_rate_switch_ends_stream():
    b = _frame(sr_idx=0) + _frame(sr_idx=1)
    n, _br, sr, _ms = MP.parse_mp3_frames(b)
    assert (n, sr) == (1, 44100)


def test_spark_stats_and_payloads(spark):
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["abcdef", "xy"]}))
    payloads = MP.mp3_payloads(docs, "doc_id", "text")
    rows = MP.mp3_stream_stats(payloads).collect()
    assert [r.id for r in rows] == [1]  # short doc skipped
    raw = "abcdef".encode()
    br = MP._BITRATES[("1", 3)][raw[0] % 14]
    n = 1 + raw[1] % 7
    sr = MP._SAMPLE_RATES[3][raw[2] % 3]
    r = rows[0]
    assert (r.n_frames, r.bitrate_kbps, r.sample_rate) == (n, br, sr)
    assert r.duration_ms == n * 1152 * 1000 // sr


def _vbr_frame(br_idx, sr_idx, body=b""):
    import struct  # noqa: F401

    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2), 0xC0])
    size = MP._frame_at(hdr, 0)[0]
    return hdr + body + b"\xaa" * (size - 4 - len(body))


def test_parse_vbr_tag_xing_and_vbri():
    import struct

    audio = b"".join(_vbr_frame(1 + f % 14, 1) for f in range(4))
    total = MP._frame_at(_vbr_frame(9, 1)[:4], 0)[0] + len(audio)
    xing = (b"\x00" * 17 + b"Xing" + struct.pack(">I", 3)
            + struct.pack(">I", 4) + struct.pack(">I", total))
    tag = MP.parse_vbr_tag(_vbr_frame(9, 1, xing) + audio)
    assert tag == ("xing", 4, total, 48000, 1152)
    vbri = (b"\x00" * 32 + b"VBRI" + struct.pack(">HHH", 1, 0, 0)
            + struct.pack(">I", total) + struct.pack(">I", 4)
            + struct.pack(">HHHH", 0, 1, 2, 1))
    tag = MP.parse_vbr_tag(_vbr_frame(9, 1, vbri) + audio)
    assert tag == ("vbri", 4, total, 48000, 1152)
    # Info fourcc (CBR files): parses, reported as 'info'
    info = (b"\x00" * 17 + b"Info" + struct.pack(">I", 1)
            + struct.pack(">I", 4))
    assert MP.parse_vbr_tag(_vbr_frame(9, 1, info))[0] == "info"
    # FRAMES flag absent -> frames None, bytes still read
    only_bytes = (b"\x00" * 17 + b"Xing" + struct.pack(">I", 2)
                  + struct.pack(">I", total))
    assert MP.parse_vbr_tag(_vbr_frame(9, 1, only_bytes))[1:3] == \
        (None, total)


def test_parse_vbr_tag_id3_skip_and_absent():
    import struct

    xing = (b"\x00" * 17 + b"Xing" + struct.pack(">I", 1)
            + struct.pack(">I", 7))
    stream = _vbr_frame(9, 1, xing)
    wrapped = (b"ID3\x04\x00\x00" + b"\x00\x00\x00\x0d" + b"\x00" * 13
               + stream)
    assert MP.parse_vbr_tag(wrapped) == ("xing", 7, None, 48000, 1152)
    # plain CBR frame with no tag in the body -> None
    assert MP.parse_vbr_tag(_vbr_frame(9, 1)) is None
    assert MP.parse_vbr_tag(b"junk") is None
    # tag torn mid-field -> None, not an exception
    torn = stream[:25 + 6]
    assert MP.parse_vbr_tag(torn) is None


def test_mp3_vbr_stats_spark(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = MP.mp3_vbr_stats(
        MP.mp3_vbr_payloads(docs, "doc_id", "text")).collect()
    assert rows
    for r in rows:
        assert r["tag"] in ("xing", "vbri")
        assert r["n_frames_walk"] == r["vbr_frames"] + 1
        # tag duration = audio frames; walk adds the tag frame
        assert r["duration_ms_walk"] >= r["duration_ms_tag"]
