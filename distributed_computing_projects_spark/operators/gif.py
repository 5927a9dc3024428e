"""GIF (87a/89a) codec in pure stdlib Python — the same
library-free-media discipline as the JPEG codec (operators/jpeg.py),
for the other ubiquitous legacy web-image format. Unlike JPEG there is
no float stage anywhere: LZW is exact and the palette lookup is exact,
so EVERY decoded pixel is integer-reproducible and the driver oracle
can check full pixel sums, not just flat-tile fixtures.

Scope: GIF87a and GIF89a, global or local color table, interlaced or
sequential row order, extension blocks (graphic control, comment,
application) skipped via their sub-block chains. ``decode_gif``
returns the first frame (the decode_image contract: one RGB raster
per payload); ``decode_gif_frames`` returns EVERY frame of an
animated GIF — each frame's own raster, disposal composition not
modeled. Malformed payloads (bad magic, truncated sub-blocks, LZW
code stream desync, missing color table) return ``None``; a stream
torn past complete frames keeps those frames (frame-granular
malformed-record drop policy, sources/csv.py).

LZW details (GIF89a spec Appendix F + the de-facto decoder behavior of
giflib): variable-width codes starting at ``min_code_size + 1`` bits,
packed LSB-first; CLEAR resets the table to the 2^mcs roots, END
terminates; the code width grows when the next free table slot reaches
``1 << width`` (after the add), capped at 12 bits with deferred-clear
tolerated (a full table simply stops growing until a CLEAR). The
encoder here mirrors the DECODER's visible slot counter — which lags
the encoder's own table by one add, because the decoder learns entry k
only while processing code k+1 — so the two stay width-synchronized by
construction; the decoder is additionally validated against real GIF
files in ``tests/test_gif.py``.

The encoder is a deterministic fixture builder (indexed raster +
palette in, byte stream out); the decoder is general over the scope
above. Reference parity note: the reference has no media decode at
all; this is BASELINE.json scale-extension surface (SURVEY.md
LLM-pipeline operators).
"""

from __future__ import annotations

import struct


def _width_for(slot: int, mcs: int) -> int:
    """Current LZW code width as a function of the decoder-visible
    next-free-slot counter: starts at mcs+1, grows when the counter
    reaches each power of two, capped at 12 (deferred clear)."""
    return min(12, max(mcs + 1, slot.bit_length()))


# ------------------------------------------------------------- decoder


def _lzw_decode(data: bytes, mcs: int, n_pixels: int):
    """Decode a GIF LZW code stream to exactly ``n_pixels`` palette
    indices. Returns ``bytes`` or ``None`` on desync/truncation."""
    if not (2 <= mcs <= 8):
        return None
    clear = 1 << mcs
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    table = roots + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev = None
    width = mcs + 1
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = roots + [b"", b""]
                prev = None
                width = mcs + 1
                continue
            if code == end:
                return bytes(out) if len(out) == n_pixels else None
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                return None
            out += entry
            if len(out) > n_pixels:
                return None
            prev = entry
            width = _width_for(len(table), mcs)
    # some writers omit the END code and rely on the block terminator
    return bytes(out) if len(out) == n_pixels else None


def _sub_blocks(b: bytes, pos: int):
    """Collect a sub-block chain starting at ``pos``. Returns
    ``(bytes, next_pos)`` or ``None`` if truncated."""
    out = bytearray()
    while True:
        if pos >= len(b):
            return None
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            return None
        out += b[pos: pos + n]
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list, h: int) -> list:
    out = [None] * h
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[i]
            i += 1
    return out


def decode_gif_frames(b: bytes, max_frames: int | None = None):
    """Decode up to ``max_frames`` image frames of a GIF (all of them
    when ``None``) to a list of ``(w, h, rows)`` tuples, ``rows``
    being ``h`` lists of ``(r, g, b)`` tuples. Each frame's OWN raster
    is returned — disposal-method composition onto the logical screen
    is not modeled, which for the full-size frames animation fixtures
    and real single-image GIFs carry IS the composed result. Returns
    ``None`` for non-GIF/structurally-malformed input with no
    decodable first frame; a stream torn PAST complete frames returns
    the frames decoded so far (GIF's LZW has no resync marker, so a
    torn frame ends the walk — frame-granular malformed-record
    policy, like flac.py's CRC drop)."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    frames: list = []
    try:
        _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            if pos + 3 * n > len(b):
                return None
            gct = [tuple(b[pos + 3 * i: pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        while pos < len(b):
            block = b[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label + sub-block chain
                if pos >= len(b):
                    raise ValueError("torn extension")
                pos += 1
                sb = _sub_blocks(b, pos)
                if sb is None:
                    raise ValueError("torn extension chain")
                pos = sb[1]
                continue
            if block != 0x2C:  # image descriptor is all that remains
                raise ValueError("unknown block")
            _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(b):
                    raise ValueError("torn local color table")
                ct = [tuple(b[pos + 3 * i: pos + 3 * i + 3])
                      for i in range(n)]
                pos += 3 * n
            if ct is None or w == 0 or h == 0:
                raise ValueError("no color table or empty frame")
            if pos >= len(b):
                raise ValueError("torn before LZW")
            mcs = b[pos]
            pos += 1
            sb = _sub_blocks(b, pos)
            if sb is None:
                raise ValueError("torn sub-blocks")
            data, pos = sb
            idx = _lzw_decode(data, mcs, w * h)
            if idx is None or max(idx) >= len(ct):
                raise ValueError("LZW desync")
            rows = [[ct[idx[y * w + x]] for x in range(w)]
                    for y in range(h)]
            if iflags & 0x40:
                rows = _deinterlace(rows, h)
            frames.append((w, h, rows))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        return frames if frames else None
    except (struct.error, IndexError, ValueError):
        return frames if frames else None


def decode_gif(b: bytes):
    """Decode the first frame of a GIF to ``(w, h, rows)`` (the
    contract decode_image's per-payload dispatch needs: one RGB
    raster, like the other image formats). ``None`` on malformed
    input. Thin wrapper over :func:`decode_gif_frames`."""
    frames = decode_gif_frames(b, max_frames=1)
    return frames[0] if frames else None


# ------------------------------------------------------------- encoder


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF LZW encode (fixture builder). Emits CLEAR, the code
    sequence, and END; widths follow the decoder-visible slot counter
    (see module doc), so decode(_lzw_encode(x)) == x by construction."""
    clear = 1 << mcs
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    emitted = 0  # codes since the last CLEAR (excluding the CLEAR)

    buf = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def cur_width() -> int:
        # the DECODER's next-free slot lags this encoder's by one add
        dslot = clear + 2 + (emitted - 1 if emitted >= 1 else 0)
        return _width_for(dslot, mcs)

    put(clear, mcs + 1)
    w = b""
    for c in indices:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        put(table[w], cur_width())
        emitted += 1
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        else:
            # table full: reset so the fixture never relies on
            # deferred-clear behavior (the decoder tolerates it anyway)
            put(clear, cur_width())
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            emitted = 0
        w = bytes([c])
    if w:
        put(table[w], cur_width())
        emitted += 1
    put(end, cur_width())
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def encode_gif(indices, w: int, h: int, palette,
               interlace: bool = False, animated_tail: int = 0) -> bytes:
    """Serialize an indexed raster as a GIF89a byte stream. ``indices``
    is ``h`` rows of ``w`` palette indices (any nested sequence),
    ``palette`` a list of (r, g, b) tuples (padded to the next legal
    power-of-two size). ``interlace`` stores rows in the 4-pass
    interlaced order. ``animated_tail`` appends that many 1x1 dummy
    frames after the first (the decoder must ignore them). Includes a
    graphic-control extension so the extension-skip path is always
    exercised."""
    n = max(2, len(palette))
    size_bits = max(1, (n - 1).bit_length())
    n_pad = 1 << size_bits
    if n_pad > 256:
        raise ValueError("palette too large")
    pal = list(palette) + [(0, 0, 0)] * (n_pad - len(palette))
    flat = []
    for row in indices:
        flat.extend(int(v) for v in row)
    if len(flat) != w * h:
        raise ValueError("indices shape != w*h")
    if any(not (0 <= v < len(palette)) for v in flat):
        raise ValueError("index out of palette range")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    for r, g, bl in pal:
        out += bytes((r, g, bl))
    # graphic control extension (89a): exercised skip path
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"

    _emit_frame(out, w, h, flat, interlace, size_bits)
    for _ in range(animated_tail):
        _emit_frame(out, 1, 1, [0], False, size_bits)
    out.append(0x3B)
    return bytes(out)


def _emit_frame(out: bytearray, fw: int, fh: int, flat, ilace: bool,
                size_bits: int) -> None:
    out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, fw, fh,
                           0x40 if ilace else 0x00))
    order = []
    if ilace:
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, fh, step))
    else:
        order = list(range(fh))
    seq = bytes(v for y in order for v in flat[y * fw:(y + 1) * fw])
    mcs = max(2, size_bits)
    out.append(mcs)
    data = _lzw_encode(seq, mcs)
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)


def encode_gif_anim(frames, w: int, h: int, palette,
                    delay_cs: int = 10) -> bytes:
    """Serialize an ANIMATED GIF89a: a NETSCAPE2.0 looping application
    extension, then per frame a graphic-control extension (``delay_cs``
    hundredths of a second) followed by a full-size image descriptor.
    ``frames`` is a list of flat ``w*h`` palette-index sequences.
    Full-size frames make each frame its own composed raster, so
    :func:`decode_gif_frames`'s no-disposal-composition contract is
    exact for these streams."""
    if not frames:
        raise ValueError("need at least one frame")
    n = max(2, len(palette))
    size_bits = max(1, (n - 1).bit_length())
    n_pad = 1 << size_bits
    if n_pad > 256:
        raise ValueError("palette too large")
    pal = list(palette) + [(0, 0, 0)] * (n_pad - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    for r, g, bl in pal:
        out += bytes((r, g, bl))
    # NETSCAPE2.0 loop-forever application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for flat in frames:
        flat = [int(v) for v in flat]
        if len(flat) != w * h:
            raise ValueError("frame shape != w*h")
        if any(not (0 <= v < len(palette)) for v in flat):
            raise ValueError("index out of palette range")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) \
            + b"\x00\x00"
        _emit_frame(out, w, h, flat, False, size_bits)
    out.append(0x3B)
    return bytes(out)
