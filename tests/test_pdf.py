"""PDF text extraction: object walk by direct /Length, Flate inflate,
Tj/TJ operator scan, literal-string escape decode, torn/malformed
drops (sources/pdf.py)."""

from __future__ import annotations

from distributed_computing_projects_spark.sources import pdf as P

RAW = bytes(range(33, 97))  # 64 bytes incl. ( ) [ ] backslash


def test_roundtrip_both_compressions_exact():
    for flate in (True, False):
        n_streams, n_flate, n_ops, text = P.extract_text(
            P.build_pdf(RAW, flate))
        assert (n_streams, n_ops) == (2, 5)  # 4 Tj + 1 TJ
        assert n_flate == (2 if flate else 0)
        assert text == RAW


def test_escape_roundtrip_hostile_bytes():
    """Parens, backslashes, control bytes, DEL — the characters whose
    escaping rules differ — roundtrip exactly, through real zlib."""
    tricky = (b"()\\\n\r\t\x00\x08\x0c\x7f" * 8)[:P.PDF_TEXT_BYTES]
    _, _, _, text = P.extract_text(P.build_pdf(tricky, True))
    assert text == tricky


def test_unescape_rules():
    assert P.unescape_string(rb"a\(b\)c\\d") == b"a(b)c\\d"
    assert P.unescape_string(rb"\101\12\7x") == b"A\n\x07x"
    # unknown escape drops the backslash (spec 3.2.3)
    assert P.unescape_string(rb"\q") == b"q"
    # escaped backslash at the tail
    assert P.unescape_string(rb"ab\\") == b"ab" + b"\\"
    # trailing LONE backslash ignored (spec: no escape follows)
    assert P.unescape_string(b"ab" + b"\\") == b"ab"


def test_tj_array_with_bracket_bytes_in_strings():
    """']' inside a literal string must not terminate the TJ array
    match (the regex's string-first alternation)."""
    data = (b"[]" * 32)[:P.PDF_TEXT_BYTES]
    _, _, n_ops, text = P.extract_text(P.build_pdf(data, False))
    assert n_ops == 5 and text == data


def test_torn_and_malformed_drop_policy():
    b = P.build_pdf(RAW, False)
    # tear inside the SECOND stream object: first stream's text keeps
    cut = b.rfind(b"stream\n") - 40
    n_streams, _, n_ops, text = P.extract_text(b[:cut])
    assert n_streams == 1 and n_ops == 4
    assert text == RAW[:32]
    # not a PDF at all -> row drop
    assert P.extract_text(b"plain text") is None
    assert P.extract_text(b"") is None
    # corrupt Flate stream: that stream drops, the other keeps
    fb = bytearray(P.build_pdf(RAW, True))
    first_stream = fb.find(b"stream\n") + 7
    fb[first_stream + 2] ^= 0xFF
    got = P.extract_text(bytes(fb))
    assert got is not None
    n_streams, n_flate, n_ops, text = got
    assert n_streams == 2 and text == RAW[32:]  # only the TJ half left


def test_endstream_bytes_inside_flate_output_do_not_tear():
    """The stream walk is /Length-delimited, not endstream-scanned: a
    compressed body that happens to contain the bytes 'endstream'
    still parses (the classic naive-parser bug)."""
    # craft a raw (uncompressed) stream whose BODY contains the word
    data = (b"endstream_in_text_endstream_in_text_endstream_in_txt___"
            b"12345678")[:P.PDF_TEXT_BYTES]
    assert b"endstream" in data
    n_streams, _, n_ops, text = P.extract_text(P.build_pdf(data, False))
    assert n_streams == 2 and n_ops == 5 and text == data


def test_spark_extraction(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = P.extract_pdf_text(
        P.pdf_payloads(docs, "doc_id", "text")).collect()
    assert out
    for r in out:
        assert r["n_streams"] == 2 and r["n_text_ops"] == 5
        assert r["n_chars"] == P.PDF_TEXT_BYTES
        assert r["n_flate"] == (2 if r["id"] % 2 == 0 else 0)
