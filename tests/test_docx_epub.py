"""DOCX and EPUB text extraction (sources/docx.py, sources/epub.py):
builder/extractor round-trips, markup transparency, decoy-part and
spine-order semantics, torn-archive and hostile-XML drops, and the
Spark stages."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.ziparchive as ZA
from distributed_computing_projects_spark.sources.docx import (
    _WML_NS,
    build_docx,
    extract_docx_text,
    parse_document_xml,
)
from distributed_computing_projects_spark.sources.epub import (
    build_epub,
    extract_epub_text,
    parse_opf,
    xhtml_paragraphs,
)

PARAS = ["first paragraph with several words in it",
         "second", "", "tab\there and a\nline break", "last"]


# ------------------------------------------------------------- docx


def test_docx_roundtrip_paragraphs_runs_and_whitespace():
    assert extract_docx_text(build_docx(PARAS)) == "\n".join(PARAS)


def test_docx_builder_deterministic():
    assert build_docx(PARAS) == build_docx(PARAS)


def test_docx_ignores_styles_and_properties():
    """styles.xml is in every archive; bold w:rPr wraps alternate
    runs — none of it may leak into the text."""
    text = extract_docx_text(build_docx(["a" * 100]))
    assert text == "a" * 100
    assert "Normal" not in text


def test_docx_strict_namespace_also_extracts():
    """ISO 29500 strict documents use a different main namespace;
    text must extract under either."""
    data = build_docx(["hello strict world"])
    members = dict(ZA.iter_zip_members(data))
    xml = members["word/document.xml"].replace(
        _WML_NS[0].encode(), _WML_NS[1].encode())
    assert parse_document_xml(xml) == ["hello strict world"]


def test_docx_foreign_namespace_text_is_invisible():
    """A w:t-shaped element in a NON-WML namespace contributes
    nothing (namespace-aware parsing, not prefix matching)."""
    xml = (b'<?xml version="1.0"?>'
           b'<w:document xmlns:w="' + _WML_NS[0].encode() +
           b'" xmlns:x="urn:other"><w:body>'
           b"<w:p><w:r><w:t>real</w:t></w:r>"
           b"<x:p><x:r><x:t>fake</x:t></x:r></x:p></w:p>"
           b"</w:body></w:document>")
    assert parse_document_xml(xml) == ["real"]


def test_docx_nested_paragraph_keeps_boundary():
    """Textbox content (w:p > ... > w:txbxContent > w:p) emits with
    the inner paragraph boundary preserved as a newline inside the
    host paragraph — not silently concatenated into one string."""
    xml = (b'<?xml version="1.0"?>'
           b'<w:document xmlns:w="' + _WML_NS[0].encode() +
           b'"><w:body><w:p><w:r><w:t>host</w:t></w:r>'
           b"<w:txbxContent>"
           b"<w:p><w:r><w:t>inner1</w:t></w:r></w:p>"
           b"<w:p><w:r><w:t>inner2</w:t></w:r></w:p>"
           b"</w:txbxContent>"
           b"<w:r><w:t>tail</w:t></w:r></w:p>"
           b"</w:body></w:document>")
    assert parse_document_xml(xml) == ["hostinner1\ninner2\ntail"]


def test_docx_torn_xml_keeps_completed_paragraphs():
    data = build_docx(PARAS)
    xml = dict(ZA.iter_zip_members(data))["word/document.xml"]
    cut = xml.rfind(b"<w:p>")
    got = parse_document_xml(xml[:cut])
    assert got is not None and got[:2] == PARAS[:2]


def test_docx_drops_without_document_xml():
    assert extract_docx_text(b"not a zip") is None
    assert extract_docx_text(ZA.build_zip([("other.xml", b"<a/>")])) is None
    assert extract_docx_text(
        ZA.build_zip([("word/document.xml", b"<<<not xml")])) is None


def test_docx_spark_stage(spark):
    from distributed_computing_projects_spark.sources.docx import (
        docx_payloads,
        extract_docx,
    )

    df = spark.createDataFrame(
        [(1, "alpha " * 30), (2, "beta"), (3, "")],
        "doc_id bigint, text string")
    rows = {r.id: r.extracted
            for r in extract_docx(
                docx_payloads(df, "doc_id", "text",
                              para_chars=64)).collect()}
    t1 = "alpha " * 30
    assert rows[1] == "\n".join(t1[k:k + 64]
                                for k in range(0, len(t1), 64))
    assert rows[2] == "beta"
    assert 3 not in rows  # empty text -> no paragraph -> row drop


# ------------------------------------------------------------- epub


CHAPTERS = [["chapter one para one", "one para two"],
            ["chapter two solo"],
            ["three a", "three b", "three c"]]


def test_epub_roundtrip_spine_order_beats_member_order():
    """Chapter members are written REVERSED in the zip; only the
    spine walk restores reading order."""
    data = build_epub(CHAPTERS)
    want = "\n".join("\n".join(ch) for ch in CHAPTERS)
    assert extract_epub_text(data) == want
    # and the member order really is reversed (the test's premise)
    names = [n for n, _ in ZA.iter_zip_members(data)
             if n.startswith("OEBPS/chap")]
    assert names == ["OEBPS/chap2.xhtml", "OEBPS/chap1.xhtml",
                     "OEBPS/chap0.xhtml"]


def test_epub_nav_decoy_excluded():
    assert "DECOY" not in extract_epub_text(build_epub(CHAPTERS))


def test_epub_inline_markup_and_br_roundtrip():
    got = extract_epub_text(build_epub([["plain", "emphasized",
                                         "broken\nline"]]))
    assert got == "plain\nemphasized\nbroken\nline"


def test_epub_missing_chapter_drops_chapter_granularly():
    data = build_epub(CHAPTERS)
    members = [(n, b) for n, b in ZA.iter_zip_members(data)
               if n != "OEBPS/chap1.xhtml"]
    got = extract_epub_text(ZA.build_zip(members))
    assert got == "\n".join(["\n".join(CHAPTERS[0]),
                             "\n".join(CHAPTERS[2])])


def test_epub_broken_package_chain_drops_row():
    assert extract_epub_text(b"junk") is None
    # zip but no container.xml
    assert extract_epub_text(ZA.build_zip([("a.txt", b"x")])) is None
    # container pointing at a missing OPF
    data = build_epub(CHAPTERS)
    members = [(n, b) for n, b in ZA.iter_zip_members(data)
               if n != "OEBPS/content.opf"]
    assert extract_epub_text(ZA.build_zip(members)) is None
    # all spine documents missing
    members = [(n, b) for n, b in ZA.iter_zip_members(data)
               if not n.startswith("OEBPS/chap")]
    assert extract_epub_text(ZA.build_zip(members)) is None


def test_epub_nonlinear_spine_items_skip():
    manifest, spine = parse_opf(
        b'<?xml version="1.0"?>'
        b'<package xmlns="http://www.idpf.org/2007/opf">'
        b'<manifest><item id="a" href="a.xhtml"/>'
        b'<item id="b" href="b.xhtml"/></manifest>'
        b'<spine><itemref idref="a"/>'
        b'<itemref idref="b" linear="no"/></spine></package>')
    assert spine == ["a"] and set(manifest) == {"a", "b"}
    assert parse_opf(b"<<<") is None


def test_epub_torn_xhtml_keeps_completed_paragraphs():
    xml = (b'<?xml version="1.0"?>'
           b'<html xmlns="http://www.w3.org/1999/xhtml"><body>'
           b"<p>done one</p><p>done two</p><p>torn mid")
    assert xhtml_paragraphs(xml) == ["done one", "done two"]
    assert xhtml_paragraphs(b"<<<") is None


def test_epub_spark_stage(spark):
    from distributed_computing_projects_spark.sources.epub import (
        epub_payloads,
        extract_epub,
    )

    df = spark.createDataFrame(
        [(1, "gamma " * 40), (2, "")], "doc_id bigint, text string")
    rows = {r.id: r.extracted
            for r in extract_epub(
                epub_payloads(df, "doc_id", "text", chapter_chars=150,
                              para_chars=50)).collect()}
    t1 = "gamma " * 40
    assert rows[1] == "\n".join(t1[k:k + 50]
                                for k in range(0, len(t1), 50))
    assert 2 not in rows


# -------------------------------------------------------------- odt


from distributed_computing_projects_spark.sources.odt import (  # noqa: E402
    _NS_TEXT,
    build_odt,
    extract_odt_text,
    parse_content_xml,
)

ODT_PARAS = ["hello  world   with    space runs",
             "tab\there and\nbreak inside", "heading three", "",
             "trailing spaces  "]


def test_odt_roundtrip_encoded_whitespace_and_headings():
    assert extract_odt_text(build_odt(ODT_PARAS)) == "\n".join(ODT_PARAS)


def test_odt_builder_deterministic():
    assert build_odt(ODT_PARAS) == build_odt(ODT_PARAS)


def test_odt_annotation_decoy_invisible_and_nonbreaking():
    """The office:annotation rides INSIDE the first paragraph: its
    text must not leak AND its inner text:p must not close the outer
    paragraph."""
    got = extract_odt_text(build_odt(ODT_PARAS))
    assert "DECOY" not in got
    assert got.split("\n")[0] == ODT_PARAS[0]


def test_odt_text_s_count_expansion():
    xml = (f'<?xml version="1.0"?><office:document-content '
           f'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:'
           f'office:1.0" xmlns:text="{_NS_TEXT}">'
           '<office:body><office:text>'
           '<text:p>a <text:s text:c="3"/>b<text:tab/>c'
           '<text:line-break/>d<text:s/>e</text:p>'
           "</office:text></office:body></office:document-content>"
           ).encode()
    assert parse_content_xml(xml) == ["a    b\tc\nd e"]


def test_odt_torn_xml_keeps_completed_paragraphs():
    import distributed_computing_projects_spark.sources.ziparchive as ZAW

    xml = dict(ZAW.iter_zip_members(build_odt(ODT_PARAS)))["content.xml"]
    cut = xml.rfind(b"<text:p")
    kept = parse_content_xml(xml[:cut])
    assert kept is not None and kept[:2] == ODT_PARAS[:2]


def test_odt_drops_without_content_xml():
    assert extract_odt_text(b"not a zip") is None
    assert extract_odt_text(ZA.build_zip([("styles.xml", b"<a/>")])) is None
    assert extract_odt_text(
        ZA.build_zip([("content.xml", b"<<<not xml")])) is None


def test_odt_spark_stage(spark):
    from distributed_computing_projects_spark.sources.odt import (
        extract_odt,
        odt_payloads,
    )

    df = spark.createDataFrame(
        [(1, "delta " * 30), (2, "")], "doc_id bigint, text string")
    rows = {r.id: r.extracted
            for r in extract_odt(
                odt_payloads(df, "doc_id", "text",
                             para_chars=72)).collect()}
    t1 = "delta " * 30
    assert rows[1] == "\n".join(t1[k:k + 72]
                                for k in range(0, len(t1), 72))
    assert 2 not in rows


def test_epub_archive_level_bomb_drops_row(monkeypatch):
    """Per-member bounds are not enough for the one consumer that
    must buffer the member table: the archive-level total bound
    drops the row before a many-member bomb materializes."""
    import distributed_computing_projects_spark.sources.epub as EPM

    monkeypatch.setattr(EPM, "MAX_TOTAL_BYTES", 64)
    assert extract_epub_text(build_epub(CHAPTERS)) is None
    monkeypatch.setattr(EPM, "MAX_TOTAL_BYTES", 1 << 30)
    assert extract_epub_text(build_epub(CHAPTERS)) is not None


def test_epub_percent_encoded_hrefs_resolve():
    """OPF hrefs are URIs: percent-encoded member names must decode
    before the member lookup."""
    import distributed_computing_projects_spark.sources.epub as EPM

    data = build_epub([["only chapter"]])
    members = []
    for n, b in ZA.iter_zip_members(data):
        if n == "OEBPS/chap0.xhtml":
            n = "OEBPS/chap 0.xhtml"
        if n == "OEBPS/content.opf":
            b = b.replace(b'href="chap0.xhtml"', b'href="chap%200.xhtml"')
        members.append((n, b))
    assert EPM.extract_epub_text(ZA.build_zip(members)) == "only chapter"
