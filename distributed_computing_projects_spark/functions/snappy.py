"""Pure-stdlib snappy (raw block format) — decoder + a simple
spec-legal encoder, from the public format description
(google/snappy format_description.txt; also RFC-referenced by the
Avro, Hadoop and Kafka ecosystems).

Why: Avro OCF's default compression in many Kafka/Sqoop deployments
is snappy, and this container has neither a snappy wheel nor a
Hadoop native lib — without a decoder those blocks are a dormant
drop path (``sources/avro.py``). The raw format is tiny: a varint
uncompressed-length preamble, then a tag stream of literals and
LZ77-style copies (three offset widths). Decode is O(n) byte moves —
acceptable for an ingest boundary (the 100 TB path converts to
parquet once, same argument as the Avro reader itself).

The encoder exists for fixtures and round-trip tests: it emits
literals plus simple length-4..64 copy2 matches found by a greedy
hash of 4-byte prefixes — any literal/copy mix is spec-legal, so
this is a REAL snappy stream (decodable by every snappy library),
just not as dense as the reference encoder's.

Policies: ``decompress`` raises ``ValueError`` on malformed input
(callers translate to their drop granularity) and never allocates
more than the bomb bound passed by the caller — the declared length
is checked BEFORE any byte moves.
"""

from __future__ import annotations


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("varint past end")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 35:
            raise ValueError("varint too long")


def decompress(data: bytes, max_length: int | None = None) -> bytes:
    """Decode one raw-format snappy block. Raises ValueError on any
    malformed shape (bad tag stream, offsets before start, output
    over/underrun, declared length over ``max_length``)."""
    n, pos = _uvarint(data, 0)
    if max_length is not None and n > max_length:
        raise ValueError("declared length over bound")
    out = bytearray()
    end = len(data)
    while pos < end:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63: that many extra LE length bytes
                nb = ln - 59
                if pos + nb > end:
                    raise ValueError("literal length past end")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > end:
                raise ValueError("literal body past end")
            out += data[pos:pos + ln]
            pos += ln
        else:
            if kind == 1:  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x07) + 4
                if pos >= end:
                    raise ValueError("copy1 offset past end")
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                if pos + 2 > end:
                    raise ValueError("copy2 offset past end")
                off = int.from_bytes(data[pos:pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                if pos + 4 > end:
                    raise ValueError("copy4 offset past end")
                off = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError("copy offset before start")
            if len(out) + ln > n:
                raise ValueError("output overrun")
            if off >= ln:  # non-overlapping: one slice
                start = len(out) - off
                out += out[start:start + ln]
            else:  # overlapping run: byte-at-a-time per spec
                start = len(out) - off
                for i in range(ln):
                    out.append(out[start + i])
        if len(out) > n:
            raise ValueError("output overrun")
    if len(out) != n:
        raise ValueError("output underrun")
    return bytes(out)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    i = 0
    while i < len(chunk):
        piece = chunk[i:i + 65536]
        ln = len(piece) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nb = (ln.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out += ln.to_bytes(nb, "little")
        out += piece
        i += len(piece)


def compress(data: bytes) -> bytes:
    """A valid raw-format snappy stream: greedy 4-byte-prefix hash
    match emitting copy2 elements (offset <= 65535, length 4..64),
    literals between matches. Every snappy decoder reads it."""
    out = bytearray(_varint(len(data)))
    n = len(data)
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535:
            # extend the match
            ln = 4
            while (ln < 64 and i + ln < n
                   and data[cand + ln] == data[i + ln]):
                ln += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            out.append(((ln - 1) << 2) | 2)
            out += (i - cand).to_bytes(2, "little")
            i += ln
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)
