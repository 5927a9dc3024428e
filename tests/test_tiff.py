"""TIFF decode: container walk (both byte orders, inline vs offset
values), grayscale photometrics, PackBits, and malformed drops
(operators/multimodal.py:_decode_tiff)."""

from __future__ import annotations

import struct

import numpy as np

from distributed_computing_projects_spark.operators.multimodal import (
    _decode_tiff,
    _packbits_decode,
)


def build_tiff(pixels: bytes, w, h, spp=3, comp=1, photo=2, order="<",
               packed=None):
    data = packed if packed is not None else pixels
    hdr = (b"II" if order == "<" else b"MM") + struct.pack(
        order + "HI", 42, 8 + len(data)
    )
    ifd_off = 8 + len(data)

    def entry(tag, typ, cnt, val4):
        return struct.pack(order + "HHI", tag, typ, cnt) + val4

    def short_inline(v):
        return struct.pack(order + "HH", v, 0)

    def long_inline(v):
        return struct.pack(order + "I", v)

    n_entries = 9
    bps_off = ifd_off + 2 + 12 * n_entries + 4
    if spp == 3:
        bps_val, bps_ext = long_inline(bps_off), struct.pack(
            order + "HHH", 8, 8, 8
        )
    else:
        bps_val, bps_ext = short_inline(8), b""
    entries = [
        entry(256, 3, 1, short_inline(w)),
        entry(257, 3, 1, short_inline(h)),
        entry(258, 3, spp, bps_val),
        entry(259, 3, 1, short_inline(comp)),
        entry(262, 3, 1, short_inline(photo)),
        entry(273, 4, 1, long_inline(8)),
        entry(277, 3, 1, short_inline(spp)),
        entry(278, 3, 1, short_inline(h)),
        entry(279, 4, 1, long_inline(len(data))),
    ]
    ifd = (struct.pack(order + "H", len(entries)) + b"".join(entries)
           + struct.pack(order + "I", 0))
    return hdr + data + ifd + bps_ext


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and data[i + run] == data[i]
               and run < 128):
            run += 1
        if run >= 3:
            out += bytes([256 - (run - 1), data[i]])
            i += run
        else:
            j = i
            while (j < len(data)
                   and (j + 2 >= len(data)
                        or not (data[j] == data[j + 1] == data[j + 2]))
                   and j - i < 128):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


PIX = bytes(range(36))


def test_rgb_both_byte_orders():
    for order in ("<", ">"):
        got = _decode_tiff(build_tiff(PIX, 4, 3, order=order))
        assert got is not None
        w, h, px = got
        assert (w, h) == (4, 3) and bytes(px) == PIX


def test_grayscale_photometrics():
    g = bytes(range(12))
    _, _, px = _decode_tiff(build_tiff(g, 4, 3, spp=1, photo=1))
    assert bytes(px) == bytes(np.repeat(np.frombuffer(g, np.uint8), 3))
    # WhiteIsZero inverts
    _, _, px = _decode_tiff(build_tiff(g, 4, 3, spp=1, photo=0))
    assert bytes(px) == bytes(
        np.repeat(255 - np.frombuffer(g, np.uint8), 3)
    )


def test_packbits_strip():
    rle = bytes([7] * 10 + list(range(20)) + [3] * 6)
    enc = packbits_encode(rle)
    assert len(enc) < len(rle)  # the fixture actually compresses
    assert _packbits_decode(enc) == rle
    got = _decode_tiff(build_tiff(rle, 4, 3, comp=32773, packed=enc))
    assert got is not None and bytes(got[2]) == rle


def test_malformed_drop():
    # wrong magic
    assert _decode_tiff(b"II\x2b\x00" + b"\x00" * 10) is None
    # strip byte count beyond payload
    t = bytearray(build_tiff(PIX, 4, 3))
    t = t[: 8 + 20]  # truncate mid-strip
    assert _decode_tiff(bytes(t)) is None
    # unsupported compression (LZW = 5)
    assert _decode_tiff(build_tiff(PIX, 4, 3, comp=5)) is None
    # size mismatch: header claims 5 wide but strip holds 4x3x3
    assert _decode_tiff(build_tiff(PIX, 5, 3)) is None
    # torn PackBits stream (literal header promising bytes past end)
    bad = bytes([10, 1, 2])
    assert _packbits_decode(bad) is None
