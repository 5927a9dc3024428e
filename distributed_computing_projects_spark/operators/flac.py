"""FLAC audio codec in pure stdlib — lossless compression is the one
audio family a library-free engine can decode EXACTLY: every stage
(Rice/unary entropy codes, fixed and LPC predictors, channel
decorrelation) is integer arithmetic, so decoded samples are
bit-identical to the encoder's input and a SQL oracle can recompute
sample aggregates from character codes. This powers
``multimodal.decode_audio``-style queries for compressed audio, next
to the PCM WAV path (operators/multimodal.py:908) — real speech/music
corpora ship FLAC precisely because it is lossless.

Scope (documented subset of the FLAC format spec,
https://xiph.org/flac/format.html): native FLAC streams ("fLaC"
magic), STREAMINFO plus skipped metadata blocks, frames with
CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC subframes, Rice
residual method 0 (4-bit parameters, any partition order), wasted
bits, all four channel assignments (independent, left/side,
right/side, mid/side), 4-32 bits per sample, UTF-8 coded frame
numbers. CRC-8 (frame header) and CRC-16 (whole frame) are VERIFIED —
a mismatch drops the frame, the malformed-record policy
(sources/csv.py) at frame granularity. Rice escape code 0b11111 and
method 1 (5-bit params) return ``None`` (outside the subset).

The decoder is GENERAL over that subset; the encoder is a
deterministic fixture builder (same division as operators/jpeg.py):
mono FIXED-predictor frames with a pinned Rice parameter, enough to
exercise warmup samples, residual reconstruction, and both CRCs on
the decode path differentially.

Reference parity: the reference (karthiksharma98/
distributed-computing-projects) has no media decode; LLM-pipeline
scale-extension surface (SURVEY.md §2 extensions) like jpeg.py/gif.py.
"""

from __future__ import annotations

import struct


def _crc8(data: bytes) -> int:
    # CRC-8 with polynomial x^8 + x^2 + x^1 + x^0 (0x07), init 0
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    # CRC-16 with polynomial 0x8005, init 0 (the spec's frame CRC)
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over bytes (no marker stuffing — FLAC,
    unlike JPEG, has no 0xFF escaping)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0    # bits consumed within data[pos]

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("bit read past end")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.pos]
            v = (v << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# fixed-predictor coefficients: prediction of s[n] from prior samples
# (order 0 predicts 0; order 1 = s[n-1]; 2 = 2s[n-1]-s[n-2]; ...)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                   256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                   8192: 13, 16384: 14, 32768: 15}


def _utf8_number(n: int) -> bytes:
    # the spec's extended-UTF-8 coded frame number
    if n < 0x80:
        return bytes([n])
    out = []
    marks = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
             (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5)]
    for limit, mark, cont in marks:
        if n <= limit:
            out.append(mark | (n >> (6 * cont)))
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    # count leading ones
    n_ones = 0
    while first & (0x80 >> n_ones):
        n_ones += 1
    if n_ones < 2 or n_ones > 6:
        raise ValueError("bad UTF-8 frame number")
    v = first & (0x7F >> n_ones)
    for _ in range(n_ones - 1):
        byte = br.read(8)
        if byte & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (byte & 0x3F)
    return v


def encode_flac(samples, sample_rate: int = 8000, bps: int = 16,
                blocksize: int = 16, order: int = 1,
                rice_param: int = 6) -> bytes:
    """Serialize mono integer samples as a native FLAC stream:
    STREAMINFO + FIXED-predictor frames (``order`` 0-2 supported
    here; warmup samples verbatim, Rice partition order 0 with a
    pinned ``rice_param``). The last frame may be short (legal for
    the final frame). MD5 in STREAMINFO is zeroed (the spec's
    "unknown" value) — decode correctness is checked by the frame
    CRCs and the differential oracle, not the stream hash."""
    if order not in (0, 1, 2):
        raise ValueError("fixture encoder supports fixed orders 0-2")
    samples = [int(s) for s in samples]
    n = len(samples)
    streaminfo = struct.pack(">HH", blocksize, blocksize)
    streaminfo += b"\x00\x00\x00" * 2  # min/max framesize unknown
    # sample rate (20) | channels-1 (3) | bps-1 (5) | total (36)
    packed = (sample_rate << 44) | (0 << 41) | ((bps - 1) << 36) | n
    streaminfo += packed.to_bytes(8, "big") + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fno, start in enumerate(range(0, n, blocksize)):
        blk = samples[start:start + blocksize]
        out += _encode_frame(blk, fno, sample_rate, bps, blocksize,
                             order, rice_param)
    return bytes(out)


def _encode_frame(blk, fno: int, sample_rate: int, bps: int,
                  nominal_bs: int, order: int, rice_param: int) -> bytes:
    bs = len(blk)
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)  # sync
    bw.write(0, 1)                  # reserved
    bw.write(0, 1)                  # fixed-blocksize stream
    # 7 => explicit 16-bit (blocksize - 1) follows the frame number
    bs_code = _BLOCKSIZE_CODE.get(bs, 7)
    bw.write(bs_code, 4)
    bw.write(0, 4)                  # sample rate: from STREAMINFO
    bw.write(0, 4)                  # channel assignment: 1 ch
    bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    bw.write(bps_code, 3)
    bw.write(0, 1)                  # reserved
    assert bw.nbits == 0  # fixed header is exactly 32 bits
    hdr = bytes(bw.out) + _utf8_number(fno)
    if bs_code == 7:
        hdr += struct.pack(">H", bs - 1)
    hdr += bytes([_crc8(hdr)])

    body = _BitWriter()
    # subframe header: 0 pad, FIXED type 0b001000 | order, no wasted.
    # The DECLARED order must be the effective one: a final block
    # shorter than the nominal order would otherwise advertise more
    # warmup samples than it carries, making the residual count
    # bs - order negative — the decoder drops the frame and the
    # stream silently loses the tail samples.
    eff_order = min(order, bs)
    body.write(0, 1)
    body.write(0b001000 | eff_order, 6)
    body.write(0, 1)
    for s in blk[:eff_order]:
        body.write(s & ((1 << bps) - 1), bps)
    # residual: method 0 (4-bit Rice), partition order 0
    body.write(0, 2)
    body.write(0, 4)
    body.write(rice_param, 4)
    coef = _FIXED_COEF[eff_order]
    for i in range(eff_order, bs):
        pred = sum(c * blk[i - 1 - j] for j, c in enumerate(coef))
        r = blk[i] - pred
        z = (2 * r) if r >= 0 else (-2 * r - 1)  # zigzag
        q, rem = z >> rice_param, z & ((1 << rice_param) - 1)
        for _ in range(q):
            body.write(0, 1)
        body.write(1, 1)
        body.write(rem, rice_param)
    body.align()
    frame = hdr + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


_BPS_DECODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BS_DECODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}


def decode_flac(b: bytes):
    """Parse a native FLAC stream into ``(sample_rate, channels,
    [channel sample lists])`` with bit-exact integer samples. GENERAL
    over the documented subset (module doc); returns ``None`` for
    non-FLAC input or a stream whose STREAMINFO is missing/torn. A
    frame that fails CRC-8/CRC-16 or parses outside the subset is
    DROPPED (frame-granular malformed-record policy); decoding
    resumes at the next sync code."""
    try:
        if len(b) < 8 or b[:4] != b"fLaC":
            return None
        pos = 4
        info = None
        # metadata blocks
        while pos + 4 <= len(b):
            hdr = b[pos]
            btype, last = hdr & 0x7F, bool(hdr & 0x80)
            length = int.from_bytes(b[pos + 1:pos + 4], "big")
            body = b[pos + 4:pos + 4 + length]
            if len(body) < length:
                return None
            if btype == 0:
                if length < 34:
                    return None
                packed = int.from_bytes(body[10:18], "big")
                info = {
                    "sample_rate": packed >> 44,
                    "channels": ((packed >> 41) & 0x7) + 1,
                    "bps": ((packed >> 36) & 0x1F) + 1,
                    "total": packed & ((1 << 36) - 1),
                }
            pos += 4 + length
            if last:
                break
        if info is None:
            return None
        channels = [[] for _ in range(info["channels"])]
        while pos < len(b):
            nxt = _decode_frame(b, pos, info, channels)
            if nxt is None:
                # resync: scan forward for the next sync code
                pos = _resync(b, pos + 1)
                if pos is None:
                    break
            else:
                pos = nxt
        return info["sample_rate"], info["channels"], channels
    except (ValueError, struct.error, IndexError, KeyError):
        return None


def _resync(b: bytes, pos: int):
    while pos + 2 <= len(b):
        if b[pos] == 0xFF and (b[pos + 1] & 0xFC) == 0xF8:
            return pos
        pos += 1
    return None


def _decode_frame(b: bytes, pos: int, info: dict, channels):
    """Decode one frame starting at ``pos``; append its samples to
    ``channels`` and return the next byte position, or ``None`` if
    the frame is malformed (caller resyncs)."""
    try:
        br = _BitReader(b, pos)
        if br.read(14) != 0b11111111111110:
            return None
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            return None
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = _BS_DECODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = info["bps"] if bps_code == 0 else _BPS_DECODE[bps_code]
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        assert br.bit == 0
        if _crc8(b[pos:br.pos]) != br.read(8):
            return None
        if ch_code < 8:
            n_ch = ch_code + 1  # independent channels
        elif ch_code in (8, 9, 10):
            n_ch = 2  # left/side, side/right, mid/side
        else:
            return None
        if n_ch != info["channels"]:
            return None
        subs = []
        for ch in range(n_ch):
            # side channels carry one extra bit of range
            extra = 1 if (
                (ch_code == 8 and ch == 1)
                or (ch_code == 9 and ch == 0)
                or (ch_code == 10 and ch == 1)) else 0
            sub = _decode_subframe(br, bs, bps + extra)
            if sub is None:
                return None
            subs.append(sub)
        br.align()
        if _crc16(b[pos:br.pos]) != int.from_bytes(
                b[br.pos:br.pos + 2], "big"):
            return None
        end = br.pos + 2
        # undo channel decorrelation
        if ch_code == 8:      # left/side: right = left - side
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:    # side/right: left = right + side
            side, right = subs
            subs = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:   # mid/side
            mid, side = subs
            left = [(((m << 1) | (s & 1)) + s) >> 1
                    for m, s in zip(mid, side)]
            subs = [left, [l - s for l, s in zip(left, side)]]
        for ch, sub in enumerate(subs):
            channels[ch].extend(sub)
        return end
    except (ValueError, struct.error, IndexError, KeyError):
        return None


def _decode_subframe(br: _BitReader, bs: int, bps: int):
    if br.read(1) != 0:
        return None
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0:                      # CONSTANT
        v = br.read_signed(bps)
        out = [v] * bs
    elif stype == 1:                    # VERBATIM
        out = [br.read_signed(bps) for _ in range(bs)]
    elif 8 <= stype <= 12:              # FIXED, order 0-4
        order = stype - 8
        out = [br.read_signed(bps) for _ in range(min(order, bs))]
        res = _decode_residual(br, bs, order)
        if res is None:
            return None
        coef = _FIXED_COEF[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append(pred + r)
    elif stype >= 32:                   # LPC, order 1-32
        order = stype - 31
        out = [br.read_signed(bps) for _ in range(min(order, bs))]
        precision = br.read(4) + 1
        if precision == 16:             # 0b1111 is invalid
            return None
        shift = br.read_signed(5)
        if shift < 0:
            return None
        coef = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        if res is None:
            return None
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append((pred >> shift) + r)
    else:
        return None
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(br: _BitReader, bs: int, order: int):
    method = br.read(2)
    if method != 0:                     # 5-bit params: outside subset
        return None
    porder = br.read(4)
    n_part = 1 << porder
    if bs % n_part:
        return None
    out = []
    for p in range(n_part):
        param = br.read(4)
        if param == 0xF:                # escape code: outside subset
            return None
        count = bs // n_part - (order if p == 0 else 0)
        if count < 0:
            return None
        for _ in range(count):
            q = br.unary()
            z = (q << param) | br.read(param)
            out.append((z >> 1) ^ -(z & 1))  # un-zigzag
    return out
