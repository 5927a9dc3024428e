"""MJPEG-in-AVI video: container mux/demux round-trip, frame decode
exactness (flat-tile contract along the time axis), malformed-drop
policy at both payload and frame granularity, and the
sample-before-decode path (operators/video.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from distributed_computing_projects_spark.operators import jpeg as J
from distributed_computing_projects_spark.operators import video as V

QTABLE = [8] + [16] * 63


def _flat_frame(y: int, cb: int, cr: int) -> bytes:
    comps = [np.zeros((1, 1, 64), dtype=np.int64) for _ in range(3)]
    for ci, v in enumerate((y, cb, cr)):
        comps[ci][0, 0, 0] = v - 128
    return J.encode_baseline(comps, 8, 8, QTABLE)


def _rgb(y: int, cb: int, cr: int):
    def cl(v):
        return max(0, min(255, v))
    r = (65536 * y + 91881 * (cr - 128) + 32768) // 65536
    g = (65536 * y - 22554 * (cb - 128) - 46802 * (cr - 128)
         + 32768) // 65536
    b = (65536 * y + 116130 * (cb - 128) + 32768) // 65536
    return cl(r), cl(g), cl(b)


def test_mux_demux_roundtrip():
    frames = [_flat_frame(40 + 3 * f, 90, 160) for f in range(5)]
    avi = V.mux_avi_mjpeg(frames, 8, 8, fps=25)
    w, h, out = V.demux_avi(avi)
    assert (w, h) == (8, 8)
    assert out == frames  # byte-exact frame payloads back out


def test_demux_skips_unknown_chunks():
    frames = [_flat_frame(100, 128, 128)]
    avi = V.mux_avi_mjpeg(frames, 8, 8)
    # splice an unknown chunk between hdrl and movi: demux must walk
    # past it (real AVIs carry JUNK alignment chunks)
    movi_at = avi.index(b"LIST" + struct.pack(
        "<I", len(b"movi") + len(frames[0]) + 8 + len(frames[0]) % 2))
    junk = b"JUNK" + struct.pack("<I", 6) + b"\x00" * 6
    spliced = avi[:movi_at] + junk + avi[movi_at:]
    spliced = spliced[:4] + struct.pack(
        "<I", struct.unpack_from("<I", spliced, 4)[0] + len(junk)
    ) + spliced[8:]
    w, h, out = V.demux_avi(spliced)
    assert out == frames


def test_demux_malformed_returns_none():
    frames = [_flat_frame(100, 128, 128)]
    avi = V.mux_avi_mjpeg(frames, 8, 8)
    assert V.demux_avi(b"") is None
    assert V.demux_avi(b"RIFFxxxxWAVE") is None
    assert V.demux_avi(b"\x89PNG\r\n\x1a\n") is None
    # truncation that tears a chunk mid-body: structurally invalid
    assert V.demux_avi(avi[:40]) is None


def test_decode_video_exact_and_frame_drop(spark):
    import pandas as pd

    frames = [_flat_frame(30 * f + 10, 80, 200) for f in range(4)]
    good = V.mux_avi_mjpeg(frames, 8, 8)
    # frame 2 torn: that FRAME drops, the clip survives
    torn_frames = list(frames)
    torn_frames[2] = frames[2][:10]
    torn = V.mux_avi_mjpeg(torn_frames, 8, 8)
    payloads = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3],
                      "payload": [good, torn, b"not an avi"]})
    )
    rows = {(r.id, r.frame_idx): r
            for r in V.decode_video(payloads).collect()}
    assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (1, 3),
                            (2, 0), (2, 1), (2, 3)]
    for f in range(4):
        r, g, b = _rgb(30 * f + 10, 80, 200)
        row = rows[(1, f)]
        assert (row.width, row.height) == (8, 8)
        assert (row.sum_r, row.sum_g, row.sum_b) == (
            64 * r, 64 * g, 64 * b)


def test_decode_video_every_k_samples_before_decode(spark):
    import pandas as pd

    frames = [_flat_frame(10 * f + 5, 128, 128) for f in range(8)]
    avi = V.mux_avi_mjpeg(frames, 8, 8)
    payloads = spark.createDataFrame(
        pd.DataFrame({"id": [7], "payload": [avi]}))
    got = sorted(
        r.frame_idx
        for r in V.decode_video(payloads, every_k=3).collect()
    )
    assert got == [0, 3, 6]


def test_avi_payloads_skip_short_docs(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2],
                      "text": ["x" * V.VID_BYTES, "short"]}))
    out = V.avi_payloads(df, "doc_id", "text").collect()
    assert [r.id for r in out] == [1]
    assert V.demux_avi(bytes(out[0].payload))[2] != []


@pytest.mark.parametrize("n", [1, 8])
def test_mux_declares_geometry(n):
    frames = [_flat_frame(50, 128, 128)] * n
    w, h, out = V.demux_avi(V.mux_avi_mjpeg(frames, 8, 8, fps=30))
    assert (w, h, len(out)) == (8, 8, n)


def test_demux_rejects_pathological_nesting():
    # 32 nested LIST headers, each claiming the rest of the payload:
    # must drop (None), not blow the recursion limit in an executor
    inner = b"\x00" * 16
    for _ in range(32):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"xxxx" + inner
    avi = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert V.demux_avi(avi) is None


def test_every_k_validated_at_api_boundary(spark):
    import pytest

    from pyspark.sql import Row

    df = spark.createDataFrame([Row(id=0, payload=bytearray(b"x"))])
    with pytest.raises(ValueError, match="every_k"):
        V.decode_video(df, every_k=0)
