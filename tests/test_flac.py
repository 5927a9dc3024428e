"""FLAC codec: lossless round-trips across fixed orders, signed and
short-frame handling, CRC-based frame drops, Rice partition orders,
LPC and channel-decorrelation decode paths, and the Spark dispatch
through multimodal.decode_audio (operators/flac.py)."""

from __future__ import annotations

import struct

import pytest

from distributed_computing_projects_spark.operators import flac as FL
from distributed_computing_projects_spark.operators import multimodal as M


@pytest.mark.parametrize("order", [0, 1, 2])
def test_roundtrip_fixed_orders(order):
    samples = [((i * 37 + 11) % 256) for i in range(48)]
    rate, ch, chans = FL.decode_flac(FL.encode_flac(samples, order=order))
    assert (rate, ch) == (8000, 1)
    assert chans[0] == samples


def test_roundtrip_signed_and_short_last_frame():
    samples = [(-300 + 41 * i) for i in range(23)]  # 16 + 7 samples
    _, _, chans = FL.decode_flac(
        FL.encode_flac(samples, blocksize=16, order=2))
    assert chans[0] == samples


def test_non_flac_and_torn_streaminfo_return_none():
    assert FL.decode_flac(b"") is None
    assert FL.decode_flac(b"RIFF1234WAVE") is None
    assert FL.decode_flac(b"fLaC") is None
    good = FL.encode_flac(list(range(16)))
    assert FL.decode_flac(good[:20]) is None  # torn STREAMINFO


def test_crc_mismatch_drops_frame_not_stream():
    b = bytearray(FL.encode_flac(list(range(32)), blocksize=16))
    b[-3] ^= 0xFF  # corrupt the second frame's body
    decoded = FL.decode_flac(bytes(b))
    assert decoded is not None
    _, _, chans = decoded
    assert chans[0] == list(range(16))  # first frame survives


def test_header_crc8_checked():
    b = bytearray(FL.encode_flac(list(range(16))))
    # frame starts right after fLaC + 4-byte block header + 34 bytes
    frame_at = 4 + 4 + 34
    assert b[frame_at] == 0xFF
    b[frame_at + 2] ^= 0x40  # flip a header bit -> CRC-8 mismatch
    _, _, chans = FL.decode_flac(bytes(b))
    assert chans[0] == []  # frame dropped


def test_decoder_handles_partitioned_rice_and_lpc():
    # hand-build a frame exercising decode paths the fixture encoder
    # never emits: an LPC subframe and a partition order > 0
    samples = [10, 12, 14, 16, 18, 20, 22, 24]
    bw = FL._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(6, 4)          # 8-bit blocksize follows
    bw.write(0, 4)
    bw.write(0, 4)          # mono
    bw.write(4, 3)          # 16 bps
    bw.write(0, 1)
    hdr = bytes(bw.out) + FL._utf8_number(0) + bytes([len(samples) - 1])
    hdr += bytes([FL._crc8(hdr)])
    body = FL._BitWriter()
    body.write(0, 1)
    body.write(32 + 1, 6)   # LPC order 2 (type 0b100000 | order-1)
    body.write(0, 1)
    for s in samples[:2]:
        body.write(s, 16)
    body.write(3 - 1, 4)    # precision 3 bits
    body.write(0, 5)        # shift 0
    # coefficients [2, -1] at 3-bit precision (predict linear ramp)
    body.write(2, 3)
    body.write(-1 & 0b111, 3)
    body.write(0, 2)        # Rice method 0
    body.write(1, 4)        # partition order 1 -> two partitions
    for p, count in ((0, 2), (1, 4)):  # 8/2 - order, then 8/2
        body.write(3, 4)    # rice param 3
        for _ in range(count):
            body.write(1, 1)     # unary 0
            body.write(0, 3)     # remainder 0 -> residual 0
    body.align()
    frame = hdr + body.bytes()
    frame += struct.pack(">H", FL._crc16(frame))
    stream = FL.encode_flac([], blocksize=8)[:42] + frame
    # patch STREAMINFO total-samples to 8
    decoded = FL.decode_flac(stream)
    assert decoded is not None
    assert decoded[2][0] == samples


def test_spark_decode_audio_dispatches_flac(spark):
    import pandas as pd

    samples = [((7 * i) % 256) for i in range(M.FLAC_SAMPLES)]
    good = FL.encode_flac(samples, order=1)
    payloads = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "payload": [good, b"not flac"]}))
    rows = M.decode_audio(payloads).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id, r.sample_rate, r.channels) == (1, 8000, 1)
    assert r.n_samples == M.FLAC_SAMPLES
    assert r.sum_amplitude == sum(samples)
    assert r.peak_amplitude == max(samples)


def test_flac_payloads_skip_short_docs(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2],
                      "text": ["x" * M.FLAC_SAMPLES, "short"]}))
    out = M.flac_payloads(df, "doc_id", "text").collect()
    assert [r.id for r in out] == [1]
    assert FL.decode_flac(bytes(out[0].payload))[2][0] == [120] * 32


def test_short_final_frame_keeps_all_samples():
    """A final block shorter than the predictor order must declare the
    EFFECTIVE order in the subframe type byte — the old encoding
    advertised order 2 with 1 warmup sample, the decoder computed a
    negative residual count and dropped the CRC-valid frame, silently
    losing the tail (17 in -> 16 out)."""
    for order in (1, 2):
        samples = list(range(16 + order - 1))  # tail shorter than order
        _, _, chans = FL.decode_flac(
            FL.encode_flac(samples, blocksize=16, order=order))
        assert chans[0] == samples
