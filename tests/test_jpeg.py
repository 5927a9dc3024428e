"""Pure-numpy baseline JPEG codec (operators/jpeg.py): coefficient
roundtrip through real Huffman bitstreams, flat-tile pixel exactness,
restart markers, malformed drops, and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from distributed_computing_projects_spark.operators import jpeg as J
from distributed_computing_projects_spark.operators import multimodal as M


def test_zigzag_is_the_standard_order():
    assert J.ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                             (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert sorted(J.ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]


@pytest.mark.parametrize("ncomp", [1, 3])
def test_coeff_roundtrip_random_blocks(ncomp):
    """encode -> decode_coeffs returns exactly coeff*q for random
    sparse blocks: negatives, long zero runs (ZRL), EOB tails."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        by, bx = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        comps = []
        for _ in range(ncomp):
            c = np.zeros((by, bx, 64), dtype=np.int64)
            c[..., 0] = rng.integers(-128, 128, (by, bx))
            for _ in range(6):
                k = int(rng.integers(1, 64))
                c[..., k] = rng.integers(-40, 41, (by, bx))
            comps.append(c)
        q = np.array([(i % 7) + 1 for i in range(64)], dtype=np.int64)
        out = J.decode_coeffs(J.encode_baseline(comps, bx * 8, by * 8, q))
        assert out is not None
        w, h, dec, samps = out
        assert (w, h) == (bx * 8, by * 8)
        assert samps == [(1, 1)] * ncomp
        for ci in range(ncomp):
            assert np.array_equal(dec[ci], comps[ci] * q)


def test_coeff_roundtrip_420_subsampled():
    """4:2:0 entropy-layer roundtrip over multiple MCUs: random sparse
    blocks in a 2x2-luma / 1x1-chroma interleave, dequantized exactly."""
    rng = np.random.default_rng(19)
    mcus_y, mcus_x = 2, 2  # 32x32 image
    sampling = [(2, 2), (1, 1), (1, 1)]
    comps = []
    for hs, vs in sampling:
        c = np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
        c[..., 0] = rng.integers(-128, 128, c.shape[:2])
        for _ in range(4):
            k = int(rng.integers(1, 64))
            c[..., k] = rng.integers(-30, 31, c.shape[:2])
        comps.append(c)
    q = np.array([(i % 5) + 1 for i in range(64)], dtype=np.int64)
    b = J.encode_baseline(comps, 32, 32, q, sampling=sampling)
    out = J.decode_coeffs(b)
    assert out is not None
    w, h, dec, samps = out
    assert (w, h) == (32, 32)
    assert samps == sampling
    assert dec[0].shape == (4, 4, 64) and dec[1].shape == (2, 2, 64)
    for ci in range(3):
        assert np.array_equal(dec[ci], comps[ci] * q)


def test_flat_420_pixel_path_is_bit_exact():
    """Flat luma quadrants + flat half-resolution chroma survive the
    full 4:2:0 pipeline (incl. nearest-neighbour upsample) bit-exactly
    — the multimodal_jpeg420_decode oracle's property."""
    rng = np.random.default_rng(23)
    yv = rng.integers(0, 256, (2, 2))
    cbv, crv = int(rng.integers(0, 256)), int(rng.integers(0, 256))
    y = np.zeros((2, 2, 64), dtype=np.int64)
    y[..., 0] = yv - 128
    cb = np.zeros((1, 1, 64), dtype=np.int64)
    cb[0, 0, 0] = cbv - 128
    cr = np.zeros((1, 1, 64), dtype=np.int64)
    cr[0, 0, 0] = crv - 128
    b = J.encode_baseline([y, cb, cr], 16, 16, [8] + [16] * 63,
                          sampling=[(2, 2), (1, 1), (1, 1)])
    w, h, rgb = J.decode_pixels(b)
    assert (w, h) == (16, 16)
    for qy in range(2):
        for qx in range(2):
            yq = int(yv[qy, qx])
            r = (yq * 65536 + 91881 * (crv - 128) + 32768) // 65536
            g = (yq * 65536 - 22554 * (cbv - 128)
                 - 46802 * (crv - 128) + 32768) // 65536
            bb = (yq * 65536 + 116130 * (cbv - 128) + 32768) // 65536
            exp = [max(0, min(255, v)) for v in (r, g, bb)]
            block = rgb[qy * 8:(qy + 1) * 8, qx * 8:(qx + 1) * 8]
            assert np.array_equal(
                block,
                np.broadcast_to(np.array(exp, dtype=np.uint8), (8, 8, 3)),
            )


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(3)
    comps = [np.zeros((2, 3, 64), dtype=np.int64)]
    comps[0][..., 0] = rng.integers(-100, 100, (2, 3))
    comps[0][..., 5] = rng.integers(-9, 10, (2, 3))
    b = J.encode_baseline(comps, 24, 16, [8] + [16] * 63,
                          restart_interval=2)
    assert b.count(b"\xff\xd0") + b.count(b"\xff\xd1") + \
        b.count(b"\xff\xd2") >= 1  # real RSTn bytes in the stream
    out = J.decode_coeffs(b)
    assert out is not None
    assert np.array_equal(out[2][0][..., 0], comps[0][..., 0] * 8)


def test_flat_tile_pixel_path_is_bit_exact():
    """Flat 8x8 tiles survive the FULL pipeline (Huffman -> dequant ->
    float IDCT -> level shift -> fixed-point YCbCr->RGB) bit-exactly —
    the property the multimodal_jpeg_decode oracle relies on."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 256, (2, 2, 3))
    comps = []
    for ci in range(3):
        c = np.zeros((2, 2, 64), dtype=np.int64)
        c[..., 0] = vals[..., ci] - 128
        comps.append(c)
    w, h, rgb = J.decode_pixels(
        J.encode_baseline(comps, 16, 16, [8] + [16] * 63)
    )
    assert (w, h) == (16, 16)
    for ty in range(2):
        for tx in range(2):
            y, cb, cr = (int(v) for v in vals[ty, tx])
            r = (y * 65536 + 91881 * (cr - 128) + 32768) // 65536
            g = (y * 65536 - 22554 * (cb - 128)
                 - 46802 * (cr - 128) + 32768) // 65536
            bb = (y * 65536 + 116130 * (cb - 128) + 32768) // 65536
            exp = [max(0, min(255, v)) for v in (r, g, bb)]
            block = rgb[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
            assert np.array_equal(
                block,
                np.broadcast_to(np.array(exp, dtype=np.uint8), (8, 8, 3)),
            )


def test_grayscale_pixels_replicate():
    c = np.zeros((1, 1, 64), dtype=np.int64)
    c[0, 0, 0] = 42 - 128
    w, h, rgb = J.decode_pixels(J.encode_baseline([c], 8, 8, [8] + [1] * 63))
    assert np.array_equal(rgb, np.full((8, 8, 3), 42, dtype=np.uint8))


def test_malformed_payloads_drop():
    c = np.zeros((1, 2, 64), dtype=np.int64)
    c[..., 0] = [[5, -5]]
    good = J.encode_baseline([c], 16, 8, [8] + [16] * 63)
    assert J.decode_coeffs(good) is not None
    assert J.decode_coeffs(b"NOTJPEG") is None
    assert J.decode_coeffs(b"\xff\xd8\xff") is None
    assert J.decode_coeffs(good[:40]) is None
    assert J.decode_coeffs(good[: len(good) // 2]) is None  # no raise
    # SOF2 + a baseline-shaped SOS is malformed AS progressive (a
    # progressive DC scan must have Se=0, this one says Se=63)
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert J.decode_coeffs(bytes(prog)) is None
    # SOS component id not matching any SOF id: drop, not KeyError
    sos = good.find(b"\xff\xda")
    bad_id = bytearray(good)
    bad_id[sos + 5] = 0x77  # Cs of the first scan component
    assert J.decode_coeffs(bytes(bad_id)) is None
    # SOS referencing an undeclared AC Huffman table: drop, not a
    # silent implicit-EOB misparse
    bad_ac = bytearray(good)
    bad_ac[sos + 6] = (bad_ac[sos + 6] & 0xF0) | 0x0F  # Ta = 15
    assert J.decode_coeffs(bytes(bad_ac)) is None


def test_decode_image_dispatch_includes_jpeg(spark):
    """A JPEG payload flows through multimodal.decode_image's format
    dispatch next to PPM/BMP/PNG, emitting the shared IMAGE_SCHEMA."""
    from pyspark.sql import Row

    vals = [[120, 130, 140], [10, 200, 90], [255, 0, 128], [1, 2, 3]]
    comps = []
    for ci in range(3):
        c = np.zeros((2, 2, 64), dtype=np.int64)
        for t in range(4):
            c[t // 2, t % 2, 0] = vals[t][ci] - 128
        comps.append(c)
    payload = J.encode_baseline(comps, 16, 16, [8] + [16] * 63)
    df = spark.createDataFrame(
        [Row(id=1, payload=bytearray(payload)),
         Row(id=2, payload=bytearray(b"garbage"))]
    )
    rows = M.decode_image(df).collect()
    assert len(rows) == 1  # garbage dropped
    r = rows[0]
    assert (r.id, r.width, r.height, r.n_px) == (1, 16, 16, 256)
    w, h, rgb = J.decode_pixels(payload)
    sums = rgb.reshape(-1, 3).sum(axis=0)
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(s) for s in sums)


def test_appn_and_com_segments_are_skipped():
    """Real JPEGs carry APP0 (JFIF) / APP1 (EXIF) / COM segments; the
    marker walk must skip them by their length fields."""
    import struct

    c = np.zeros((1, 1, 64), dtype=np.int64)
    c[0, 0, 0] = 7
    base = J.encode_baseline([c], 8, 8, [8] + [1] * 63)
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"written by a test"
    inject = (
        struct.pack(">BBH", 0xFF, 0xE0, len(app0) + 2) + app0
        + struct.pack(">BBH", 0xFF, 0xFE, len(com) + 2) + com
    )
    payload = base[:2] + inject + base[2:]
    out = J.decode_coeffs(payload)
    assert out is not None
    assert out[2][0][0, 0, 0] == 7 * 8


def test_coeff_roundtrip_422_subsampled():
    """4:2:2 ((2,1) luma) also flows through the generic MCU order."""
    rng = np.random.default_rng(29)
    sampling = [(2, 1), (1, 1), (1, 1)]
    comps = []
    for hs, vs in sampling:
        c = np.zeros((2 * vs, 2 * hs, 64), dtype=np.int64)  # 2x2 MCUs
        c[..., 0] = rng.integers(-100, 100, c.shape[:2])
        c[..., 9] = rng.integers(-20, 21, c.shape[:2])
        comps.append(c)
    q = [2] * 64
    out = J.decode_coeffs(J.encode_baseline(comps, 32, 16, q,
                                            sampling=sampling))
    assert out is not None
    w, h, dec, samps = out
    assert (w, h, samps) == (32, 16, sampling)
    for ci in range(3):
        assert np.array_equal(dec[ci], comps[ci] * 2)


def test_real_forward_dct_image_survives_with_low_error():
    """Lossy end-to-end sanity the fixture paths cannot give: a smooth
    natural-style image is forward-DCT'd and quantized IN THE TEST
    (the codec itself never needs a forward transform), entropy-coded
    by the encoder, then decoded by the full pixel pipeline. A
    systematic transform error (zigzag mixup, IDCT normalization,
    dequant off-by-table) would blow the error up; correct decode
    keeps it within ordinary quantization loss."""
    m = J._idct_basis()
    # px = M^T F M  =>  F = M px M^T (M is orthogonal)
    size = 64
    xs = np.arange(size)
    img = (
        128
        + 60 * np.sin(xs[:, None] / 9.0)
        + 40 * np.cos(xs[None, :] / 5.0)
        + (xs[:, None] + xs[None, :]) / 4.0
    ).clip(0, 255)
    qt_nat = np.array([min(1 + (r + c) * 2, 40)
                       for r in range(8) for c in range(8)])
    zz_index = [r * 8 + c for (r, c) in J.ZIGZAG]
    qt_zz = [int(qt_nat[i]) for i in zz_index]
    nb = size // 8
    blocks = np.zeros((nb, nb, 64), dtype=np.int64)
    for by in range(nb):
        for bx in range(nb):
            f = m @ (img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128) @ m.T
            fz = np.array([f.reshape(64)[i] for i in zz_index])
            blocks[by, bx] = np.round(fz / np.array(qt_zz)).astype(np.int64)
    b = J.encode_baseline([blocks], size, size, qt_zz)
    w, h, rgb = J.decode_pixels(b)
    assert (w, h) == (size, size)
    err = np.abs(rgb[..., 0].astype(np.float64) - img)
    assert err.mean() < 3.0, err.mean()   # ordinary quantization loss
    assert err.max() < 30.0, err.max()    # no block-level blowups


# ------------------------------------------------------- progressive


def test_progressive_coeff_roundtrip_scripts():
    """encode_progressive -> decode_coeffs is exact across scan
    scripts: DC-only refinement, spectral bands, per-band successive
    approximation (T.81 Annex G)."""
    rng = np.random.default_rng(31)
    for ncomp in (1, 3):
        comps = []
        for _ in range(ncomp):
            c = np.zeros((2, 3, 64), dtype=np.int64)
            c[..., 0] = rng.integers(-128, 128, (2, 3))
            for _ in range(6):
                k = int(rng.integers(1, 64))
                c[..., k] = rng.integers(-40, 41, (2, 3))
            comps.append(c)
        q = np.array([(i % 7) + 1 for i in range(64)], dtype=np.int64)
        for dc_al, bands in ((0, ((1, 63, 0),)),
                             (2, ((1, 5, 1), (6, 63, 0))),
                             (1, ((1, 10, 2), (11, 63, 1)))):
            b = J.encode_progressive(comps, 24, 16, q, dc_al=dc_al,
                                     ac_bands=bands)
            out = J.decode_coeffs(b)
            assert out is not None
            w, h, dec, samps = out
            assert (w, h) == (24, 16)
            for ci in range(ncomp):
                assert np.array_equal(dec[ci], comps[ci] * q)


def test_progressive_420_roundtrip():
    """Progressive + 4:2:0: interleaved DC scans over the subsampled
    MCU layout, non-interleaved per-component AC scans."""
    rng = np.random.default_rng(37)
    sampling = [(2, 2), (1, 1), (1, 1)]
    comps = []
    for hs, vs in sampling:
        c = np.zeros((2 * vs, 2 * hs, 64), dtype=np.int64)
        c[..., 0] = rng.integers(-128, 128, c.shape[:2])
        for _ in range(4):
            k = int(rng.integers(1, 64))
            c[..., k] = rng.integers(-30, 31, c.shape[:2])
        comps.append(c)
    q = np.array([(i % 5) + 1 for i in range(64)], dtype=np.int64)
    b = J.encode_progressive(comps, 32, 32, q, sampling=sampling,
                             dc_al=2, ac_bands=((1, 8, 1), (9, 63, 0)))
    out = J.decode_coeffs(b)
    assert out is not None
    w, h, dec, samps = out
    assert samps == sampling
    for ci in range(3):
        assert np.array_equal(dec[ci], comps[ci] * q)


def test_progressive_eob_runs_and_refinement_zrl():
    """The two entropy shapes unique to progressive: multi-block EOB
    runs (EOBn with extension bits) and ZRL/correction-bit interplay
    in AC refinement scans."""
    q = np.full(64, 3, dtype=np.int64)
    # 128 blocks, 3 sparse coefficients -> EOB runs spanning >64 blocks
    c = np.zeros((8, 16, 64), dtype=np.int64)
    c[0, 0, 0] = 50
    c[3, 7, 17] = -9
    c[7, 15, 63] = 21
    b = J.encode_progressive([c], 128, 64, q, dc_al=1,
                             ac_bands=((1, 63, 1),))
    out = J.decode_coeffs(b)
    assert out is not None and np.array_equal(out[2][0], c * q)
    # refinement ZRL: a >16 zero-history gap between coefficients that
    # only become significant at Al=0, crossing an Al=2 first scan
    c2 = np.zeros((1, 2, 64), dtype=np.int64)
    c2[0, 0, 1] = 1
    c2[0, 0, 20] = 8
    c2[0, 0, 40] = 1
    c2[0, 1, 63] = -1
    b = J.encode_progressive([c2], 16, 8, q, dc_al=0,
                             ac_bands=((1, 63, 2),))
    out = J.decode_coeffs(b)
    assert out is not None and np.array_equal(out[2][0], c2 * q)


def test_progressive_flat_pixels_match_baseline():
    """The full pixel path (decode_pixels) on flat tiles is identical
    whether the stream is baseline or progressive — the fixture
    property the multimodal_jpeg_progressive_decode oracle uses."""
    vals = [[120, 130, 140], [10, 200, 90], [255, 0, 128], [1, 2, 3]]
    comps = []
    for ci in range(3):
        c = np.zeros((2, 2, 64), dtype=np.int64)
        for t in range(4):
            c[t // 2, t % 2, 0] = vals[t][ci] - 128
        comps.append(c)
    qt = [8] + [16] * 63
    pp = J.decode_pixels(J.encode_progressive(comps, 16, 16, qt, dc_al=2))
    pb = J.decode_pixels(J.encode_baseline(comps, 16, 16, qt))
    assert pp is not None and pb is not None
    assert np.array_equal(pp[2], pb[2])


def test_progressive_malformed_payloads_drop():
    c = np.zeros((1, 1, 64), dtype=np.int64)
    c[0, 0, 0] = 7
    c[0, 0, 3] = 2
    good = J.encode_progressive([c], 8, 8, [4] * 64, dc_al=1)
    assert J.decode_coeffs(good) is not None
    # truncations never raise
    for cut in (40, len(good) // 3, len(good) // 2):
        J.decode_coeffs(good[:cut])
    # corrupt a scan header's Ah/Al into an invalid refinement step
    sos_positions = []
    p = 0
    while True:
        p = good.find(b"\xff\xda", p)
        if p < 0:
            break
        sos_positions.append(p)
        p += 2
    assert len(sos_positions) >= 3  # DC first + refine + AC first
    bad = bytearray(good)
    last_sos = sos_positions[-1]
    ln = (bad[last_sos + 2] << 8) | bad[last_sos + 3]
    bad[last_sos + 2 + ln - 1] = 0x53  # Ah=5, Al=3: not one-bit refine
    assert J.decode_coeffs(bytes(bad)) is None


def test_progressive_encoder_rejects_ac_in_padding_blocks():
    """Non-MCU-multiple subsampled dims: AC scans never visit the
    MCU-padding blocks, so nonzero AC there must be rejected instead
    of silently dropped (the exact-round-trip contract)."""
    import numpy as np
    import pytest

    w = h = 20  # 4:2:0 -> luma MCU grid 4x4, non-interleaved 3x3
    sampling = [(2, 2), (1, 1), (1, 1)]
    comps = []
    for hs, vs in sampling:
        gy, gx = (2 * vs, 2 * hs)
        comps.append(np.zeros((gy, gx, 64), dtype=np.int32))
    qt = [1] * 64
    # baseline: all-zero padding encodes fine
    J.encode_progressive(comps, w, h, qt, sampling=sampling)
    comps[0][3][3][5] = 7  # padding block of luma gets AC energy
    with pytest.raises(ValueError, match="padding"):
        J.encode_progressive(comps, w, h, qt, sampling=sampling)
