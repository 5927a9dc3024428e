"""Shared MSB-first LZW decoder: TIFF 6.0 §13 and PDF LZWDecode
(ISO 32000-1 §7.4.4) are the same codec — fixed 8-bit roots,
ClearCode=256, EOD=257, variable 9→12-bit codes packed MSB-first
(GIF's LZW, ``operators/gif.py``, is the LSB-first cousin and stays
separate). The single dialect knob is ``early_change``: whether the
code width bumps one code BEFORE the table actually fills. TIFF
writers always bump early; PDF defaults to early (1) and may switch
it off per-stream via ``/DecodeParms << /EarlyChange 0 >>``.

Out-of-spec input (oversized codes, table overflow past 12 bits,
missing EOD) returns None — callers translate that to their
record-granular drop. ``max_out`` is the zip-bomb guard
(``sources/warc.py`` discipline): LZW output can grow quadratically
in the input, so decoding stops and drops once the produced bytes
exceed the bound instead of ballooning one hostile payload into an
executor OOM.

Reference parity note: the reference engine
(karthiksharma98/distributed-computing-projects) reads plain
text/CSV only (mp1/src/grep.go); media/document codecs are
LLM-ingest extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

_CLEAR, _EOD = 256, 257


def lzw_decode(
    data: bytes, early_change: int = 1, max_out: int | None = None
) -> bytes | None:
    """Decode one MSB-first LZW stream; None on torn/ill-formed input
    or when the output would exceed ``max_out`` bytes."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    acc = n_bits = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    for byte in data:
        acc = (acc << 8) | byte
        n_bits += 8
        while n_bits >= width:
            code = (acc >> (n_bits - width)) & ((1 << width) - 1)
            n_bits -= width
            if code == _CLEAR:
                reset()
                continue
            if code == _EOD:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            if max_out is not None and len(out) > max_out:
                return None  # bomb guard: drop, don't balloon
            prev = entry
            # a conforming writer MUST emit ClearCode before the table
            # could exceed 12-bit code space; growing past 4096 means
            # the stream is ill-formed (libtiff errors here too) —
            # decoding on with an oversized table fabricates output
            if len(table) > 4096:
                return None
            # width grows when the next code would not fit the table;
            # early_change bumps one code sooner (at 511/1023/2047)
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return None  # no EOD: torn stream
