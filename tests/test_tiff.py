"""TIFF decode: container walk (both byte orders, inline vs offset
values), grayscale photometrics, PackBits, and malformed drops
(operators/multimodal.py:_decode_tiff)."""

from __future__ import annotations

import struct

import numpy as np

from distributed_computing_projects_spark.operators.multimodal import (
    _decode_tiff,
    _packbits_decode,
    _tiff_lzw_decode,
)


def build_tiff(pixels: bytes, w, h, spp=3, comp=1, photo=2, order="<",
               packed=None, pred=None):
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

    n_entries = 9 + (1 if pred is not None else 0)
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
    if pred is not None:
        entries.append(entry(317, 3, 1, short_inline(pred)))
    ifd = (struct.pack(order + "H", len(entries)) + b"".join(entries)
           + struct.pack(order + "I", 0))
    return hdr + data + ifd + bps_ext


def tiff_diff_rows(pixels: bytes, w: int, spp: int) -> bytes:
    """Forward horizontal differencing (TIFF 6.0 §14) — the encode
    twin of the decoder's predictor-2 cumulative sum."""
    out = bytearray()
    stride = w * spp
    for r in range(0, len(pixels), stride):
        row = pixels[r:r + stride]
        prev = [0] * spp
        for x in range(0, len(row), spp):
            for c in range(spp):
                out.append((row[x + c] - prev[c]) & 0xFF)
                prev[c] = row[x + c]
    return bytes(out)


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
    # unsupported compression (old-style JPEG-in-TIFF = 6)
    assert _decode_tiff(build_tiff(PIX, 4, 3, comp=6)) is None
    # LZW-declared strip that is actually raw bytes: ill-formed stream
    assert _decode_tiff(build_tiff(PIX, 4, 3, comp=5)) is None
    # size mismatch: header claims 5 wide but strip holds 4x3x3
    assert _decode_tiff(build_tiff(PIX, 5, 3)) is None
    # torn PackBits stream (literal header promising bytes past end)
    bad = bytes([10, 1, 2])
    assert _packbits_decode(bad) is None


def tiff_lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW encoder (MSB-first, EarlyChange) for the
    round-trip tests — written from the spec, not by inverting the
    decoder. Width bumps track the DECODER's table, which grows one
    code later than the writer's and on every non-first data code
    INCLUDING the final flush — so a boundary crossed exactly at the
    flush still emits EOI at the width the decoder reads it with."""
    CLEAR, EOI = 256, 257
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    dec_len = 258  # decoder table size after reading the last code
    emitted = 0  # data codes since the last ClearCode
    out_bits.append((CLEAR, width))
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        out_bits.append((table[cur], width))
        emitted += 1
        if emitted >= 2:
            dec_len += 1  # the decoder appends on every non-first code
        # EarlyChange: mirror the decoder's len(table)+1 test exactly
        if dec_len + 1 >= (1 << width) and width < 12:
            width += 1
        table[nxt] = next_code
        next_code += 1
        if next_code == 4094:
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            dec_len = 258
            emitted = 0
        cur = bytes([byte])
    if cur:
        out_bits.append((table[cur], width))
        emitted += 1
        if emitted >= 2:
            dec_len += 1
        if dec_len + 1 >= (1 << width) and width < 12:
            width += 1
    out_bits.append((EOI, width))
    acc = n = 0
    out = bytearray()
    for code, w in out_bits:
        acc = (acc << w) | code
        n += w
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def test_lzw_and_deflate_strips():
    import zlib

    from distributed_computing_projects_spark.operators.multimodal import (
        _tiff_lzw_decode,
    )

    rle = bytes([7] * 10 + list(range(20)) + [3] * 6)
    # LZW round-trip at the codec level, incl. a wide-alphabet stream
    # that forces width growth
    wide = bytes((i * 7) % 256 for i in range(3000))
    for payload in (rle, wide, b"", bytes(range(256)) * 3):
        assert _tiff_lzw_decode(tiff_lzw_encode(payload)) == payload
    # ...and through the container for both compressions
    got = _decode_tiff(build_tiff(rle, 4, 3, comp=5,
                                  packed=tiff_lzw_encode(rle)))
    assert got is not None and bytes(got[2]) == rle
    got = _decode_tiff(build_tiff(rle, 4, 3, comp=8,
                                  packed=zlib.compress(rle)))
    assert got is not None and bytes(got[2]) == rle
    # torn streams drop
    assert _tiff_lzw_decode(tiff_lzw_encode(rle)[:-2]) is None
    assert _decode_tiff(build_tiff(rle, 4, 3, comp=8,
                                   packed=b"\x00bogus")) is None


def test_lzw_rejects_table_overflow_without_clear():
    """A stream that keeps growing the string table past 4096 entries
    without an intervening ClearCode is ill-formed (a conforming
    writer must clear before exhausting 12-bit code space; libtiff
    errors): decode must return None, not fabricate pixels."""
    # encoder twin that deliberately NEVER emits ClearCode
    out = bytearray()
    acc = 0
    n_bits = 0
    width = 9

    def put(code):
        nonlocal acc, n_bits
        acc = (acc << width) | code
        n_bits += width
        while n_bits >= 8:
            out.append((acc >> (n_bits - 8)) & 0xFF)
            n_bits -= 8

    put(256)  # initial Clear (the only one)
    table_len = 258
    prev = 0
    put(prev)
    # emit alternating roots; every code after the first appends one
    # table entry, so ~3850 codes overflow the 4096-entry table
    for i in range(1, 4000):
        put(i % 256)
        table_len += 1
        if table_len + 1 >= (1 << width) and width < 12:
            width += 1
    if n_bits:
        out.append((acc << (8 - n_bits)) & 0xFF)
    assert _tiff_lzw_decode(bytes(out)) is None


# -- r13: predictor 2 (horizontal differencing, tag 317) ----------------------


def test_predictor2_lzw_and_uncompressed():
    from distributed_computing_projects_spark.operators.multimodal import (
        _decode_tiff,
    )

    px = bytes((x * 7 + c) % 256 for x in range(6 * 4) for c in range(3))
    diffed = tiff_diff_rows(px, 6, 3)
    # predictor-2 + LZW (the layout scanned TIFFs actually ship)
    got = _decode_tiff(build_tiff(px, 6, 4, comp=5, pred=2,
                                  packed=tiff_lzw_encode(diffed)))
    assert got is not None and bytes(got[2]) == px
    # predictor-2 without compression decodes too (tag is orthogonal)
    got = _decode_tiff(build_tiff(diffed, 6, 4, pred=2))
    assert got is not None and bytes(got[2]) == px
    # grayscale predictor-2
    gray = bytes((x * 11) % 256 for x in range(6 * 4))
    gd = tiff_diff_rows(gray, 6, 1)
    got = _decode_tiff(build_tiff(gd, 6, 4, spp=1, photo=1, pred=2))
    assert got is not None
    import numpy as np

    assert bytes(np.asarray(got[2]).reshape(-1, 3)[:, 0]) == gray


def test_predictor2_not_silently_ignored():
    """A predictor-2 file decoded as predictor-1 yields deltas as
    pixels — the decoder must UNDO the differencing, and unknown
    predictors must drop rather than fabricate."""
    from distributed_computing_projects_spark.operators.multimodal import (
        _decode_tiff,
    )

    px = bytes((x * 7) % 256 for x in range(6 * 4 * 3))
    diffed = tiff_diff_rows(px, 6, 3)
    got = _decode_tiff(build_tiff(diffed, 6, 4, pred=2))
    assert bytes(got[2]) == px != diffed
    assert _decode_tiff(build_tiff(px, 6, 4, pred=3)) is None  # float pred
