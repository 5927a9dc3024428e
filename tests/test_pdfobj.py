"""PDF 1.5+ object model: COS parser, xref streams (plain and PNG
predictor 12), object streams, indirect /Length through ObjStm,
hex strings, ToUnicode CMaps (bfchar/bfrange, scalar and array dst),
font tracking, torn/malformed drops (sources/pdfobj.py)."""

from __future__ import annotations

import zlib

import pytest

from distributed_computing_projects_spark.sources import pdf as P14
from distributed_computing_projects_spark.sources import pdfobj as P

RAW = bytes(range(33, 97))  # 64 bytes incl. ( ) [ ] backslash


# -- COS object parser -------------------------------------------------------

def test_parse_scalars_and_collections():
    v, _ = P.parse_object(b" << /A 1 /B -2.5 /C (s) /D <414243> /E"
                          b" [1 2 0 R /N true false null] >>", 0)
    assert v == {"A": 1, "B": -2.5, "C": b"s", "D": b"ABC",
                 "E": [1, P.Ref(2), "N", True, False, None]}


def test_parse_nested_parens_and_name_hex():
    v, _ = P.parse_object(b"(a(b(c))d)", 0)
    assert v == b"a(b(c))d"
    v, _ = P.parse_object(b"/A#20B", 0)
    assert v == "A B"


def test_parse_hex_string_odd_padding_and_ws():
    v, _ = P.parse_object(b"<4 1 4\n2 4>", 0)
    assert v == b"AB@"  # odd digit count pads a trailing 0


def test_parse_comments_skipped():
    v, _ = P.parse_object(b"% note\n 7", 0)
    assert v == 7


def test_ref_vs_plain_ints():
    v, _ = P.parse_object(b"[1 2 R 3 4]", 0)
    assert v == [P.Ref(1), 3, 4]
    v, _ = P.parse_object(b"[1 2 3]", 0)
    assert v == [1, 2, 3]


# -- builders x extractor matrix --------------------------------------------

@pytest.mark.parametrize("predictor", [True, False])
def test_objstm_roundtrip(predictor):
    f = P.extract_facts(P.build_pdf_objstm(RAW, predictor))
    assert f is not None
    assert f["n_pages"] == 1 and f["n_objstm"] == 1
    assert f["n_compressed_objs"] == 6
    assert f["pred"] == (12 if predictor else 1)
    assert f["n_text_ops"] == 5 and f["n_chars"] == P14.PDF_TEXT_BYTES
    assert f["prefix_sum"] == sum(RAW)


@pytest.mark.parametrize("flate", [True, False])
def test_tounicode_roundtrip(flate):
    f = P.extract_facts(P.build_pdf_tounicode(RAW, flate))
    assert f is not None
    assert f["n_fonts"] == 2
    assert f["n_text_ops"] == 4 and f["n_hex_strings"] == 4
    assert f["n_chars"] == P14.PDF_TEXT_BYTES + len(P.TOUNICODE_TAIL)
    assert f["prefix_sum"] == sum(RAW) + P.TOUNICODE_TAIL_SUM


def test_hostile_bytes_through_cmap_and_objstm():
    """Control bytes hit the bfchar table, >=0x80 hits the bfrange
    tail — mapped code points must sum to the source bytes."""
    tricky = bytes([0, 9, 10, 31, 0x20, 0x7F, 0x80, 0xFF] * 8)
    f = P.extract_facts(P.build_pdf_tounicode(tricky, True))
    assert f["prefix_sum"] == sum(tricky) + P.TOUNICODE_TAIL_SUM
    f = P.extract_facts(P.build_pdf_objstm(tricky, True))
    assert f["prefix_sum"] == sum(tricky)


def test_classic_14_fixture_parses_through_xref_walk():
    """The 1.4 scanner's fixture is also a valid document for the
    object-model path (classic table branch)."""
    f = P.extract_facts(P14.build_pdf(RAW, flate=True))
    assert f["n_pages"] == 1 and f["n_compressed_objs"] == 0
    assert f["n_chars"] == P14.PDF_TEXT_BYTES
    assert f["prefix_sum"] == sum(RAW)


# -- ToUnicode CMap corners --------------------------------------------------

def test_bfrange_array_destination():
    data = (b"begincodespacerange <00> <FF> endcodespacerange\n"
            b"beginbfchar <01> <0041> endbfchar\n"
            b"beginbfrange <10> <12> [<0058> <0059> <005A>] endbfrange")
    clen, table = P.parse_tounicode(data)
    assert clen == 1
    assert table[0x01] == "A"
    assert [table[c] for c in (0x10, 0x11, 0x12)] == ["X", "Y", "Z"]


def test_bfrange_scalar_increments_and_cap():
    clen, table = P.parse_tounicode(
        b"beginbfrange <0041> <0043> <0061> endbfrange")
    assert clen == 2
    assert [table[c] for c in (0x41, 0x42, 0x43)] == ["a", "b", "c"]
    # hostile span is bounded, not enumerated to 2^32
    _, table = P.parse_tounicode(
        b"beginbfrange <00000000> <FFFFFFFF> <00000041> endbfrange")
    assert len(table) <= P._RANGE_CAP


def test_unmapped_code_is_replacement_char():
    assert P._map_shown(b"\x00\x99", (2, {0x41: "A"})) == "\N{REPLACEMENT CHARACTER}"


# -- predictor decode --------------------------------------------------------

def test_up_filter_roundtrip():
    rows = bytes(range(60))  # 12 rows of width 5
    filtered = P._up_filter(rows, 5)
    out = P._apply_predictor(filtered, {"Predictor": 12, "Columns": 5})
    assert out == rows


def test_tiff_predictor2_roundtrip_and_drops():
    # r13: predictor 2 (horizontal differencing) is now SUPPORTED for
    # 8-bit components — the classic scanned-TIFF-in-PDF layout
    plain = bytes(range(40))
    diffed = bytearray()
    for r in range(0, 40, 8):
        prev = 0
        for byte in plain[r:r + 8]:
            diffed.append((byte - prev) & 0xFF)
            prev = byte
    parms = {"Predictor": 2, "Columns": 8}
    assert P._apply_predictor(bytes(diffed), parms) == plain
    # sub-byte components and torn rows still drop
    assert P._apply_predictor(
        bytes(diffed), {"Predictor": 2, "Columns": 8,
                        "BitsPerComponent": 4}) is None
    assert P._apply_predictor(
        bytes(diffed[:-3]), parms) is None
    # predictor values 3..9 are not defined PDF values
    assert P._apply_predictor(b"\x00" * 10, {"Predictor": 3}) is None


# -- drop policy -------------------------------------------------------------

def test_malformed_drops():
    assert P.extract_facts(b"plain text") is None
    assert P.extract_facts(b"") is None
    assert P.extract_facts(b"%PDF-1.5\ngarbage with no startxref") is None
    whole = P.build_pdf_objstm(RAW, True)
    # torn tail: startxref gone
    assert P.extract_facts(whole[: len(whole) // 2]) is None
    # startxref kept but the body it points into is gone
    sx = whole.rindex(b"startxref")
    assert P.extract_facts(whole[:200] + whole[sx:]) is None


def test_corrupt_objstm_drops_payload():
    b = bytearray(P.build_pdf_objstm(RAW, True))
    # flip a byte inside the ObjStm's Flate body: the page tree is
    # unreachable -> whole payload drops (document-granular: without
    # the catalog there is no record to keep)
    at = bytes(b).find(b"/Type /ObjStm")
    stream_at = bytes(b).find(b"stream\n", at) + 9
    b[stream_at] ^= 0xFF
    assert P.extract_facts(bytes(b)) is None


def test_unsupported_filter_drops_stream_not_payload():
    """Marking the CMap stream LZW (same byte length, unsupported
    filter) drops THAT stream only: the document still parses, the
    CID bytes fall back to latin-1 so the hash facts shift — proving
    the CMap was genuinely load-bearing before the drop."""
    b = P.build_pdf_tounicode(RAW, False)
    assert b.count(b"/FlateDecode /Type /CMap") == 1
    lzw = b.replace(b"/FlateDecode /Type /CMap", b"/LZWDecodeee /Type /CMap")
    assert len(lzw) == len(b)  # offsets/xref stay valid
    f = P.extract_facts(lzw)
    assert f is not None and f["n_fonts"] == 2
    # 64 source bytes arrive as 128 raw CID bytes via latin-1
    assert f["n_chars"] == 2 * P14.PDF_TEXT_BYTES + len(P.TOUNICODE_TAIL)
    good = P.extract_facts(b)
    assert f["prefix_sum"] != good["prefix_sum"]


# -- Spark wiring ------------------------------------------------------------

def test_spark_objstm(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = P.extract_pdf_objstm(
        P.pdf_objstm_payloads(docs, "doc_id", "text")).collect()
    assert out
    for r in out:
        assert r["n_objstm"] == 1 and r["n_compressed_objs"] == 6
        assert r["pred"] == (12 if r["id"] % 2 == 0 else 1)
        assert r["n_chars"] == P14.PDF_TEXT_BYTES


def test_spark_tounicode(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = P.extract_pdf_tounicode(
        P.pdf_tounicode_payloads(docs, "doc_id", "text")).collect()
    assert out
    for r in out:
        assert r["n_fonts"] == 2 and r["n_hex_strings"] == 4
        assert r["n_chars"] == P14.PDF_TEXT_BYTES + len(P.TOUNICODE_TAIL)


def test_incremental_update_prev_chain():
    """The append-only update layout every Acrobat-touched PDF has: a
    replacement object and a second xref section with /Prev chaining
    to the original. The NEWEST definition of each object must win
    (first-seen along the startxref->Prev walk), so the extracted
    text reflects the update while untouched objects resolve through
    the old table."""
    import re

    base = P14.build_pdf(RAW, flate=False)
    old_sx = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    # replacement for object 4 (the four-Tj stream showing RAW[:32]):
    # same geometry, different bytes
    new_half = bytes(range(97, 129))
    tj = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
        b"(" + P14.escape_string(new_half[i:i + 8]) + b") Tj"
        for i in range(0, 32, 8)
    ) + b" ET"
    out = bytearray(base)
    off4 = len(out)
    out += (b"4 0 obj << /Length %d >>\nstream\n" % len(tj)
            + tj + b"\nendstream\nendobj\n")
    new_xref = len(out)
    out += b"xref\n4 1\n%010d 00000 n \n" % off4
    out += (b"trailer << /Size 9 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (old_sx, new_xref))

    f = P.extract_facts(bytes(out))
    assert f is not None and f["n_pages"] == 1
    # first half updated, second half (object 5, via /Prev) unchanged
    assert f["n_chars"] == P14.PDF_TEXT_BYTES
    assert f["prefix_sum"] == sum(new_half) + sum(RAW[32:])
    # the base document still reads its original text
    assert P.extract_facts(base)["prefix_sum"] == sum(RAW)


def _stream_obj(num: int, content: bytes) -> bytes:
    return (b"%d 0 obj << /Length %d >>\nstream\n" % (num, len(content))
            + content + b"\nendstream\nendobj\n")


def _classic(objs: list[bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer << /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref))
    return bytes(out)


def test_multilevel_page_tree():
    """Real documents nest /Pages nodes; the walk must reach every
    leaf Page across levels and extract all their content."""
    texts = [b"alpha-p1", b"beta-p2", b"gamma-p3"]
    conts = [b"BT /F1 12 Tf (" + t + b") Tj ET" for t in texts]
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 3 >>"
        b" endobj\n",
        b"3 0 obj << /Type /Pages /Parent 2 0 R /Kids [5 0 R 6 0 R]"
        b" /Count 2 >> endobj\n",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 9 0 R"
        b" /Resources << /Font << /F1 10 0 R >> >> >> endobj\n",
        b"5 0 obj << /Type /Page /Parent 3 0 R /Contents 7 0 R"
        b" /Resources << /Font << /F1 10 0 R >> >> >> endobj\n",
        b"6 0 obj << /Type /Page /Parent 3 0 R /Contents 8 0 R"
        b" /Resources << /Font << /F1 10 0 R >> >> >> endobj\n",
        _stream_obj(7, conts[0]),
        _stream_obj(8, conts[1]),
        _stream_obj(9, conts[2]),
        b"10 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" >> endobj\n",
    ]
    f = P.extract_facts(_classic(objs))
    assert f is not None and f["n_pages"] == 3
    assert f["n_text_ops"] == 3
    assert f["n_chars"] == sum(len(t) for t in texts)
    assert f["prefix_sum"] == sum(sum(t) for t in texts)


def test_hybrid_xrefstm_bridge():
    """The hybrid layout Acrobat writes for 1.4 compatibility: a
    CLASSIC trailer whose /XRefStm points at a cross-reference stream
    carrying extra entries. Here the classic table omits the content
    stream's object; only the bridged xref stream defines it, so text
    only appears if /XRefStm is followed."""
    content = b"BT /F1 12 Tf (bridged) Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        _stream_obj(4, content),
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" >> endobj\n",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    # xref STREAM defining ONLY object 4 (type-1 row, W [1 3 1])
    rows = bytes([1]) + offsets[3].to_bytes(3, "big") + bytes([0])
    xdata = zlib.compress(rows, 6)
    xref_stm_off = len(out)
    out += (b"6 0 obj << /Type /XRef /Size 7 /W [1 3 1] /Index [4 1]"
            b" /Root 1 0 R /Length %d /Filter /FlateDecode >>\nstream\n"
            % len(xdata) + xdata + b"\nendstream\nendobj\n")
    # classic table covering objects 0-3, 5 (object 4 ABSENT)
    xref = len(out)
    out += b"xref\n0 4\n0000000000 65535 f \n"
    for off in offsets[:3]:
        out += b"%010d 00000 n \n" % off
    out += b"5 1\n%010d 00000 n \n" % offsets[4]
    out += (b"trailer << /Size 7 /Root 1 0 R /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (xref_stm_off, xref))

    f = P.extract_facts(bytes(out))
    assert f is not None and f["n_pages"] == 1
    assert f["n_chars"] == len(b"bridged")
    assert f["prefix_sum"] == sum(b"bridged")


def test_hostile_nesting_is_row_drop_not_recursion_error():
    """5000 nested brackets must drop the row (bounded parse), never
    escape the worker as a RecursionError killing the whole batch."""
    deep = (b"%PDF-1.5\n1 0 obj " + b"[" * 5000 + b"]" * 5000
            + b" endobj\nstartxref\n9\n%%EOF\n")
    assert P.extract_facts(deep) is None


def test_cyclic_page_tree_terminates():
    """Two /Pages nodes listing each other as kids must terminate
    (seen-by-identity breaks the cycle; the memoized object store
    returns the same dict for the same Ref) — a hang here would pin
    an executor core forever on one hostile payload."""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Pages /Kids [2 0 R 4 0 R] /Count 1 >>"
        b" endobj\n",
        b"4 0 obj << /Type /Page /Parent 3 0 R /Contents 5 0 R"
        b" /Resources << /Font << /F1 6 0 R >> >> >> endobj\n",
        _stream_obj(5, b"BT /F1 12 Tf (survives) Tj ET"),
        b"6 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" >> endobj\n",
    ]
    f = P.extract_facts(_classic(objs))
    assert f is not None and f["n_pages"] == 1
    assert f["prefix_sum"] == sum(b"survives")


def test_cmap_surrogate_pair_destination():
    """A bfchar destination above the BMP arrives as a UTF-16
    surrogate pair in the CMap hex — it must decode to the single
    astral code point, and prefix_sum counts it once."""
    import unicodedata  # noqa: F401  (documents the plane claim)

    clen, table = P.parse_tounicode(
        b"beginbfchar <0001> <D835DD04> endbfchar")
    assert clen == 2
    assert table[1] == "\U0001D504"  # MATHEMATICAL FRAKTUR CAPITAL A
    assert P._map_shown(b"\x00\x01", (clen, table)) == "\U0001D504"
