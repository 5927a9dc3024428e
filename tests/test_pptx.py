"""PPTX source (sources/pptx.py): the presentation->rels->slide
chain vs member/rId order, notes/master decoys, strict namespaces,
slide-granular drops, torn XML, and the Spark stage."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.ziparchive as ZA
from distributed_computing_projects_spark.sources.pptx import (
    _DML_NS,
    _PML_NS,
    build_pptx,
    extract_pptx_text,
    parse_rels,
    slide_paragraphs,
    slide_rids_from_presentation,
)

SLIDES = [[f"slide{i} para{j} body text" for j in range(3)]
          for i in range(12)]
WANT = "\n".join("\n".join(s) for s in SLIDES)


def _members(data):
    return dict(ZA.iter_zip_members(data))


def test_roundtrip_order_beats_member_and_rid_order():
    """12 slides: member order is reversed AND slide10+ sort before
    slide2 lexicographically AND rIds are anti-monotonic — only the
    sldIdLst -> rels chain can produce the true order."""
    got = extract_pptx_text(build_pptx(SLIDES))
    assert got == WANT


def test_notes_and_master_decoys_never_leak():
    got = extract_pptx_text(build_pptx(SLIDES))
    assert "DECOY" not in got
    # the decoy really is in the archive, carrying a:t runs
    members = _members(build_pptx(SLIDES))
    assert any("notesSlide" in n for n in members)
    assert b"DECOY" in members["ppt/notesSlides/notesSlide1.xml"]


def test_builder_deterministic():
    assert build_pptx(SLIDES) == build_pptx(SLIDES)


def test_strict_namespaces_also_extract():
    """ISO 29500 strict uses different PML/DML namespaces; the
    extractor must accept either pair."""
    data = build_pptx([["strict text"]])
    members = [(n, b.replace(_PML_NS[0].encode(), _PML_NS[1].encode())
                .replace(_DML_NS[0].encode(), _DML_NS[1].encode()))
               for n, b in _members(data).items()]
    assert extract_pptx_text(ZA.build_zip(members)) == "strict text"


def test_foreign_namespace_text_invisible():
    xml = (b'<?xml version="1.0"?>'
           b'<p:sld xmlns:p="' + _PML_NS[0].encode() +
           b'" xmlns:a="' + _DML_NS[0].encode() +
           b'" xmlns:x="urn:other">'
           b"<a:p><a:r><a:t>real</a:t></a:r>"
           b"<x:p><x:r><x:t>fake</x:t></x:r></x:p></a:p></p:sld>")
    assert slide_paragraphs(xml) == ["real"]


def test_missing_slide_drops_slide_granularly():
    data = build_pptx(SLIDES)
    members = [(n, b) for n, b in _members(data).items()
               if n != "ppt/slides/slide5.xml"]
    got = extract_pptx_text(ZA.build_zip(members))
    want = "\n".join("\n".join(s) for i, s in enumerate(SLIDES)
                     if i != 4)
    assert got == want


def test_torn_slide_keeps_completed_paragraphs():
    members = _members(build_pptx([["para one", "para two", "zzz"]]))
    slide = members["ppt/slides/slide1.xml"]
    cut = slide.rfind(b"<a:p>")
    members["ppt/slides/slide1.xml"] = slide[:cut]
    got = extract_pptx_text(ZA.build_zip(list(members.items())))
    assert got == "para one\npara two"


def test_broken_chain_drops_row():
    data = build_pptx(SLIDES)
    for victim in ("ppt/presentation.xml",
                   "ppt/_rels/presentation.xml.rels"):
        members = [(n, b) for n, b in _members(data).items()
                   if n != victim]
        assert extract_pptx_text(ZA.build_zip(members)) is None
    assert extract_pptx_text(b"not a zip") is None
    assert extract_pptx_text(ZA.build_zip([("a.txt", b"x")])) is None


def test_dangling_rid_drops_slide():
    members = _members(build_pptx([["a"], ["b"]]))
    rels = members["ppt/_rels/presentation.xml.rels"]
    # remove slide 1's relationship entirely: its r:id dangles
    import re

    members["ppt/_rels/presentation.xml.rels"] = re.sub(
        rb"<Relationship [^>]*slides/slide1\.xml[^>]*/>", b"", rels)
    got = extract_pptx_text(ZA.build_zip(list(members.items())))
    assert got == "b"


def test_package_absolute_target_resolves():
    members = _members(build_pptx([["abs"]]))
    rels = members["ppt/_rels/presentation.xml.rels"]
    members["ppt/_rels/presentation.xml.rels"] = rels.replace(
        b'Target="slides/slide1.xml"',
        b'Target="/ppt/slides/slide1.xml"')
    got = extract_pptx_text(ZA.build_zip(list(members.items())))
    assert got == "abs"


def test_rids_parse_only_inside_sldidlst():
    members = _members(build_pptx([["x"]]))
    rids = slide_rids_from_presentation(members["ppt/presentation.xml"])
    assert rids == ["rId2"]  # rId999 (notesMaster) must not appear
    rels = parse_rels(members["ppt/_rels/presentation.xml.rels"])
    assert rels["rId999"].endswith("notesMaster1.xml")


def test_archive_bomb_bound(monkeypatch):
    import distributed_computing_projects_spark.sources.pptx as PX

    monkeypatch.setattr(PX, "MAX_TOTAL_BYTES", 64)
    assert PX.extract_pptx_text(build_pptx(SLIDES)) is None


def test_spark_stage(spark):
    from distributed_computing_projects_spark.sources.pptx import (
        extract_pptx,
        pptx_payloads,
    )

    df = spark.createDataFrame(
        [(1, "alpha " * 40), (2, "beta"), (3, "")],
        "doc_id bigint, text string").filter("length(text) >= 1")
    out = extract_pptx(
        pptx_payloads(df, "doc_id", "text",
                      slide_chars=60, para_chars=20)).collect()
    rows = {r.id: r.extracted for r in out}
    assert set(rows) == {1, 2}
    assert rows[2] == "beta"
    text = "alpha " * 40
    want = "\n".join(text[k:k + 20] for k in range(0, len(text), 20))
    assert rows[1] == want


def test_cli_pptx_text(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    (tmp_path / "deck.pptx").write_bytes(build_pptx([["hello deck"]]))
    assert main(["pptx-text", str(tmp_path)], spark=spark) == 0
    assert "hello deck" in capsys.readouterr().out
