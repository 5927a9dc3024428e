"""PDF stream filters beyond FlateDecode (ISO 32000-1 §7.4.2-§7.4.5)
and the xref free-entry tombstones: codec round-trips against the
independent encoder twins, the hostile edge cases each spec calls
out, filter chaining, /DecodeParms list padding, and incremental-
update deletion semantics."""

from __future__ import annotations

import random
import zlib

import pytest

from distributed_computing_projects_spark.functions.lzw import lzw_decode
from distributed_computing_projects_spark.sources import pdfobj as PO

TEXT = bytes(range(32, 96))


# -- LZW ---------------------------------------------------------------------


@pytest.mark.parametrize("ec", [0, 1])
def test_lzw_roundtrip_both_dialects(ec):
    rng = random.Random(1300 + ec)
    cases = [b"", b"A", b"AB" * 500, bytes(range(256)) * 8]
    cases += [bytes(rng.randrange(256) for _ in range(n))
              for n in (1, 63, 511, 2048)]
    # boundary-exact sweep: width bumps at the flush code were a real
    # encoder-twin bug (EOD emitted one bit-width behind the decoder)
    cases += [bytes((i * 7) % 256 for i in range(n))
              for n in range(248, 264)]
    for payload in cases:
        assert lzw_decode(PO._lzw_encode(payload, ec), ec) == payload


def test_lzw_dialect_mismatch_is_detected():
    rng = random.Random(7)
    big = bytes(rng.randrange(256) for _ in range(4000))
    # decoding an EarlyChange-1 stream as EarlyChange-0 desyncs the
    # bit reader — it must corrupt or drop, never silently match
    assert lzw_decode(PO._lzw_encode(big, 1), 0) != big


def test_lzw_torn_and_hostile_drop():
    enc = PO._lzw_encode(TEXT, 1)
    assert lzw_decode(enc, 1) == TEXT
    assert lzw_decode(enc[:-2], 1) is None  # no EOD: torn
    assert lzw_decode(b"", 1) is None
    assert lzw_decode(b"\xff" * 64, 1) is None  # out-of-table codes


def test_lzw_bomb_bound():
    bomb = PO._lzw_encode(b"\x00" * (1 << 20), 1)
    assert len(bomb) < (1 << 16)
    assert lzw_decode(bomb, 1, max_out=1 << 16) is None
    assert lzw_decode(bomb, 1) == b"\x00" * (1 << 20)


# -- ASCIIHex / ASCII85 / RunLength ------------------------------------------


def test_asciihex_edges():
    assert PO._asciihex_decode(b"48 65 6C\n6C6F>") == b"Hello"
    assert PO._asciihex_decode(b"7>") == b"\x70"  # odd digit reads as 70
    assert PO._asciihex_decode(b">") == b""
    assert PO._asciihex_decode(b"48656C6C6F") is None  # no EOD: torn
    assert PO._asciihex_decode(b"4G>") is None  # non-hex byte


def test_ascii85_edges():
    assert PO._ascii85_decode(PO._ascii85_encode(b"Hello world")) == (
        b"Hello world")
    assert PO._ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert PO._ascii85_decode(b"~>") == b""
    # 'z' inside a group is ill-formed
    assert PO._ascii85_decode(b"!!z!!~>") is None
    # group value overflow past 2^32-1 ('uuuuu' > max quad)
    assert PO._ascii85_decode(b"uuuuu~>") is None
    # a single trailing digit cannot encode any byte count
    assert PO._ascii85_decode(b"!!!!!" b"!~>") is None
    assert PO._ascii85_decode(b"!!!!!") is None  # no EOD: torn
    assert PO._ascii85_decode(b"\x80~>") is None  # out-of-alphabet
    # partial-group byte counts 1..3
    for k in (1, 2, 3):
        payload = bytes(range(40, 40 + k))
        assert PO._ascii85_decode(PO._ascii85_encode(payload)) == payload


def test_runlength_edges():
    assert PO._runlength_decode(PO._runlength_encode(b"aaaabcd" * 9)) == (
        b"aaaabcd" * 9)
    assert PO._runlength_decode(b"\x00X\x80") == b"X"
    assert PO._runlength_decode(b"\xffY\x80") == b"YY"
    assert PO._runlength_decode(b"\x02ab") is None  # torn literal
    assert PO._runlength_decode(b"\xfe") is None  # torn repeat
    assert PO._runlength_decode(b"\x00X") is None  # no EOD byte


def test_runlength_bomb_bound(monkeypatch):
    monkeypatch.setattr(PO, "MAX_STREAM_BYTES", 1 << 10)
    bomb = PO._runlength_encode(b"\x00" * (1 << 16))
    assert PO._runlength_decode(bomb) is None


# -- decode_stream: chaining + /DecodeParms padding ---------------------------


def _ident(v):
    return v


def test_chained_filters_decode_in_order():
    body = b"chained-filter-content " * 4
    raw = PO._ascii85_encode(PO._lzw_encode(body, 1))
    dct = {"Filter": ["ASCII85Decode", "LZWDecode"]}
    assert PO.decode_stream(dct, raw, _ident) == body


def test_short_decodeparms_list_pads_not_truncates():
    """ADVICE r12: a /DecodeParms list shorter than /Filter must pad
    with null — zip truncation silently skipped the tail filters and
    returned partially decoded bytes as fully decoded."""
    body = b"pad-me " * 8
    raw = PO._asciihex_encode(zlib.compress(body, 6))
    dct = {"Filter": ["ASCIIHexDecode", "FlateDecode"],
           "DecodeParms": [None]}
    assert PO.decode_stream(dct, raw, _ident) == body


def test_unsupported_filter_still_drops():
    dct = {"Filter": ["ASCIIHexDecode", "DCTDecode"]}
    assert PO.decode_stream(dct, b"4142>", _ident) is None


def test_lzw_earlychange_parm_respected():
    rng = random.Random(3)
    body = bytes(rng.randrange(256) for _ in range(3000))
    raw = PO._lzw_encode(body, 0)
    dct = {"Filter": "LZWDecode", "DecodeParms": {"EarlyChange": 0}}
    assert PO.decode_stream(dct, raw, _ident) == body
    # same bytes decoded with the default dialect must NOT pass
    assert PO.decode_stream({"Filter": "LZWDecode"}, raw, _ident) != body


# -- fixture matrix end-to-end -----------------------------------------------


@pytest.mark.parametrize("variant", range(PO.FILTER_VARIANTS))
def test_filter_matrix_extracts_exact_text(variant):
    facts = PO.extract_facts(PO.build_pdf_filters(TEXT, variant))
    assert facts is not None
    assert facts["extracted"] == TEXT.decode("latin-1")
    assert facts["n_pages"] == 1
    assert facts["n_text_ops"] == 5


@pytest.mark.parametrize("variant", range(PO.FILTER_VARIANTS))
def test_filter_matrix_torn_stream_drops_stream_not_doc(variant):
    b = PO.build_pdf_filters(TEXT, variant)
    at = b.index(b"stream\n") + len(b"stream\n")
    end = b.index(b"\nendstream")
    torn = b[:at] + b[at:end][:-5] + b[end:]
    # /Length now overshoots into 'endstream' — the stream is torn at
    # parse or at decode; either way the doc must not raise and must
    # not report the full text
    facts = PO.extract_facts(torn)
    assert facts is None or facts["extracted"] != TEXT.decode("latin-1")


# -- xref free-entry tombstones ----------------------------------------------


def _append_incremental_free(b: bytes, num: int) -> bytes:
    """Append an incremental update that FREES object ``num`` via a
    classic xref section chaining to the original with /Prev."""
    prev = int(b[b.rindex(b"startxref") + 9:].split()[0])
    xref_at = len(b)
    upd = (b"xref\n%d 1\n0000000000 00001 f \n" % num
           + b"trailer << /Size 6 /Root 1 0 R /Prev %d >>\n" % prev
           + b"startxref\n%d\n%%%%EOF\n" % xref_at)
    return b + upd


def test_incremental_free_shadows_older_inuse_entry():
    """ADVICE r12: a newer section's free entry must tombstone the
    slot — setdefault otherwise let the OLDER /Prev section resurrect
    the deleted object."""
    base = PO.build_pdf_filters(TEXT, 2)
    doc = PO.PdfDocument(base)
    assert doc.get(4) is not None  # content stream exists in the base
    upd = PO.PdfDocument(_append_incremental_free(base, 4))
    assert upd.get(4) is None  # freed by the newer section, stays dead
    assert upd.get(1) is not None  # untouched objects still resolve
    # whole-doc extraction: page's /Contents is gone -> no text
    facts = PO.extract_facts(_append_incremental_free(base, 4))
    assert facts is None or facts["extracted"] == ""
