"""WAT metadata records (sources/wat.py): envelope builder/walk
round-trip, record-granular skip/drop policies over the shared WARC
framing, the JVM-side JSON link stage, and the PageRank composition
contract (no dangling nodes)."""

from __future__ import annotations

import gzip
import json

from distributed_computing_projects_spark.sources import warc as W
from distributed_computing_projects_spark.sources import wat as WAT


def _payload(i: int, n: int) -> bytes:
    url = f"https://corpus.example.com/doc/{i}"
    links = [f"https://corpus.example.com/doc/{(i * 7 + j * 13) % n}"
             for j in range(1, i % 3 + 2)]
    info = W.build_record("warcinfo",
                          {"Content-Type": "application/warc-fields"},
                          b"software: fixture-wat\r\n")
    meta = WAT.build_metadata_record(
        url, WAT.build_envelope(url, links, f"Doc {i}"))
    return gzip.compress(info, mtime=0) + gzip.compress(meta, mtime=0)


def test_envelope_layout_is_common_crawl_shaped():
    env = json.loads(WAT.build_envelope("u", ["a", "b"], "t"))
    links = (env["Envelope"]["Payload-Metadata"]
             ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"])
    assert links == [{"path": "A@/href", "url": "a"},
                     {"path": "A@/href", "url": "b"}]
    assert (env["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"]
            == "u")


def test_record_walk_keeps_metadata_skips_warcinfo(spark):
    df = spark.createDataFrame([(bytearray(_payload(4, 10)),)],
                               "payload binary")
    rows = WAT.metadata_records(df).collect()
    assert len(rows) == 1  # the warcinfo member skipped
    assert rows[0].url.endswith("/doc/4")
    assert "Links" in rows[0].meta


def test_plain_uncompressed_wat_also_walks(spark):
    url = "https://corpus.example.com/doc/9"
    meta = WAT.build_metadata_record(
        url, WAT.build_envelope(url, [], "t"))
    df = spark.createDataFrame([(bytearray(meta),)], "payload binary")
    assert WAT.metadata_records(df).count() == 1


def test_torn_gzip_tail_keeps_complete_members(spark):
    data = _payload(4, 10)
    df = spark.createDataFrame(
        [(bytearray(data + gzip.compress(b"torn", mtime=0)[:-4]),),
         (bytearray(b"not a warc at all"),)],
        "payload binary")
    rows = WAT.metadata_records(df).collect()
    assert len(rows) == 1 and rows[0].url.endswith("/doc/4")


def test_extract_links_multiset_and_asset_drop(spark):
    n = 10
    df = spark.createDataFrame([(i,) for i in range(n)],
                               "doc_id bigint")
    edges = WAT.extract_links(
        WAT.wat_payloads(df, "doc_id", n)).collect()
    got = sorted((r.src, r.dst) for r in edges)
    want = sorted((i, (i * 7 + j * 13) % n)
                  for i in range(n) for j in range(1, i % 3 + 2))
    assert got == want
    assert all(r.path == "A@/href" for r in edges)
    # the id%5==0 CSS-asset records are in the payloads but must
    # contribute no edges (their envelope has no HTML-Metadata and
    # their URL has no trailing doc id): counted above by `want`


def test_invalid_json_envelope_drops_record_granularly(spark):
    bad = WAT.build_metadata_record(
        "https://corpus.example.com/doc/3", b"{not json")
    good = WAT.build_metadata_record(
        "https://corpus.example.com/doc/5",
        WAT.build_envelope("https://corpus.example.com/doc/5",
                           ["https://corpus.example.com/doc/6"], "t"))
    df = spark.createDataFrame([(bytearray(bad + good),)],
                               "payload binary")
    edges = WAT.extract_links(df).collect()
    assert [(r.src, r.dst) for r in edges] == [(5, 6)]


def test_fixture_graph_has_no_dangling_nodes(spark):
    """pagerank_fixedpoint requires every node to carry an out-edge;
    the fixture topology must guarantee it at any corpus size."""
    for n in (1, 2, 7, 50):
        srcs = {i for i in range(n)}
        dsts = {(i * 7 + j * 13) % n
                for i in range(n) for j in range(1, i % 3 + 2)}
        assert dsts <= srcs  # every target has out-degree >= 1
