"""Wikipedia multistream-bz2 MediaWiki dump ingestion: member walk,
expat page parse, XML escape roundtrip, namespace scoping, torn-stream
policy (sources/wikidump.py)."""

from __future__ import annotations

import bz2

from distributed_computing_projects_spark.sources import wikidump as WD

PAGES = [
    (0, "Doc 0", 0, 'hello & <world> "quoted" \'markup\''),
    (1, "Talk:Doc 0", 1, "talk"),
    (2, "Doc 1", 0, "second article text here"),
]


def _stream_sizes(b: bytes) -> list[int]:
    pos, sizes = 0, []
    while pos < len(b):
        d = bz2.BZ2Decompressor()
        d.decompress(b[pos:])
        consumed = len(b) - pos - len(d.unused_data)
        sizes.append(consumed)
        pos += consumed
    return sizes


def test_multistream_roundtrip_with_xml_escaping():
    b = WD.build_dump(PAGES, pages_per_stream=2)
    # genuinely multistream: header + 2 page streams + closer
    assert len(_stream_sizes(b)) == 4
    got = WD.extract_dump(b)
    assert [(p["page_id"], p["title"], p["ns"], p["text"])
            for p in got] == PAGES


def test_page_id_not_confused_with_revision_id():
    """<revision><id> nests deeper than <page><id>: the page id must
    come from the page-level element even though revision ids also
    fire the same tag name."""
    got = WD.extract_dump(WD.build_dump(PAGES))
    assert [p["page_id"] for p in got] == [0, 1, 2]


def test_torn_stream_keeps_completed_pages():
    b = WD.build_dump(PAGES, pages_per_stream=2)
    sizes = _stream_sizes(b)
    # tear inside the closing stream: all pages complete, XML just
    # lacks </mediawiki> — expat error at the tail, pages kept
    t = WD.extract_dump(b[:-5])
    assert [p["page_id"] for p in t] == [0, 1, 2]
    # tear inside the SECOND page stream: the first stream's 2 pages
    # survive, page 2 is gone
    cut = sizes[0] + sizes[1] + 10
    t2 = WD.extract_dump(b[:cut])
    assert [p["page_id"] for p in t2] == [0, 1]
    # tear inside the FIRST page stream: no completed page -> drop
    assert WD.extract_dump(b[:sizes[0] + 10]) is None
    # not bz2 at all
    assert WD.extract_dump(b"<mediawiki/>") is None
    assert WD.extract_dump(b"") is None


def test_bunzip_members_garbage_after_valid():
    one = bz2.compress(b"payload", 9)
    assert WD.bunzip_members(one + b"BZhgarbage") == b"payload"
    assert WD.bunzip_members(b"plain") is None


def test_spark_extraction_and_ns_filter(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = WD.extract_pages(
        WD.wikidump_payloads(docs, "doc_id", "text"))
    rows = out.collect()
    n_docs = docs.count()
    assert len(rows) == 2 * n_docs
    arts = [r for r in rows if r["ns"] == 0]
    talks = [r for r in rows if r["ns"] == 1]
    assert len(arts) == len(talks) == n_docs
    assert all(r["title"].startswith("Doc ") for r in arts)
    assert all(r["title"].startswith("Talk:") for r in talks)
    assert all(r["page_id"] == 2 * r["id"] for r in arts)
    assert all(r["n_text_bytes"] == 22 for r in talks)
