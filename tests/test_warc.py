"""WARC source: record walk, header parse, HTTP envelope strip,
warcinfo/request skip, torn-record policy, and the Spark extraction
contract (sources/warc.py)."""

from __future__ import annotations

from distributed_computing_projects_spark.sources import warc as W


def _two_record_file(body=b"hello world", url="https://a.example.com/1"):
    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: fixture\r\n")
    return info + W.build_response_record(url, body)


def test_parse_and_extract_roundtrip():
    b = _two_record_file()
    records = W.parse_records(b)
    assert [h["warc-type"] for h, _ in records] == ["warcinfo", "response"]
    status, _head, body = W.split_http_response(records[1][1])
    assert (status, body) == (200, b"hello world")
    assert records[1][0]["warc-target-uri"] == "https://a.example.com/1"


def test_multiple_responses_and_request_skip():
    req = W.build_record(
        "request",
        {"Content-Type": "application/http; msgtype=request"},
        b"GET / HTTP/1.1\r\n\r\n")
    b = _two_record_file() + req + W.build_response_record(
        "https://b.example.com/2", b"x" * 5, status=404)
    records = W.parse_records(b)
    responses = [(h, blk) for h, blk in records
                 if h["warc-type"] == "response"]
    assert len(responses) == 2
    assert W.split_http_response(responses[1][1])[0] == 404


def test_malformed_and_torn():
    assert W.parse_records(b"") is None
    assert W.parse_records(b"GIF89a") is None
    b = _two_record_file()
    torn = b[:len(b) - 10]  # tears the response block
    kept = W.parse_records(torn)
    assert [h["warc-type"] for h, _ in kept] == ["warcinfo"]
    # binary body with high bytes survives Content-Length delimiting
    raw = bytes(range(256))
    rec = W.parse_records(W.build_response_record("u", raw))
    assert W.split_http_response(rec[0][1])[2] == raw


def test_spark_extract_responses(spark):
    import pandas as pd

    good = _two_record_file(body=b"abcd" * 20)
    payloads = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2], "payload": [good, b"not a warc"]}))
    rows = W.extract_responses(payloads).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.url == "https://a.example.com/1"
    assert (r.status, r.n_body_bytes) == (200, 80)
    assert r.prefix_sum == sum(b"abcd" * 8)  # first 32 bytes


def test_spark_warc_payloads_urls(spark):
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [7], "text": ["short"], "source": ["src3"]}))
    out = W.warc_payloads(docs, "doc_id", "text", "source").collect()
    records = W.parse_records(bytes(out[0].payload))
    resp = [h for h, _ in records if h["warc-type"] == "response"][0]
    assert resp["warc-target-uri"] == "https://src3.example.com/doc/7"


def test_negative_content_length_terminates():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -5\r\n\r\n")
    assert W.parse_records(bad * 3) is None


def _gz(record: bytes) -> bytes:
    import gzip

    return gzip.compress(record, compresslevel=6, mtime=0)


def test_gunzip_members_roundtrip_and_torn():
    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: fixture\r\n")
    resp = W.build_response_record("https://a.example.com/1", b"hello")
    stream = _gz(info) + _gz(resp)
    assert W.gunzip_members(stream) == info + resp
    # tear the SECOND member mid-stream: the first member's records
    # survive (record-granular drop, same policy as parse_records)
    torn = stream[: len(_gz(info)) + 8]
    assert W.gunzip_members(torn) == info
    recs = W.parse_records(W.gunzip_members(torn))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo"]
    # garbage after valid members: members before the corruption keep
    assert W.gunzip_members(stream + b"\x1f\x8bgarbage") == info + resp
    # not gzip at all -> None (row drop)
    assert W.gunzip_members(b"plain text") is None
    assert W.gunzip_members(b"") is None


def test_spark_extract_gzip_payloads(spark):
    import pandas as pd

    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: fixture\r\n")
    resp = W.build_response_record("https://a.example.com/1",
                                   b"abcd" * 20)
    good = _gz(info) + _gz(resp)
    torn = good[: len(_gz(info)) + 8]  # response member torn away
    payloads = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3],
        "payload": [good, torn, _GZIP_GARBAGE]}))
    rows = W.extract_responses(payloads).collect()
    # id 1 extracts; id 2 has only the warcinfo record left (no
    # response rows); id 3 is not a gzip stream despite the magic
    assert [r["id"] for r in rows] == [1]
    assert rows[0]["n_body_bytes"] == 80
    assert rows[0]["url"] == "https://a.example.com/1"


_GZIP_GARBAGE = b"\x1f\x8b" + b"\x00" * 30


def test_gz_payload_builder_matches_plain(spark):
    """Gzip is lossless: the extraction facts from warc_gz_payloads
    must equal warc_payloads' on the same docs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = sorted(
        tuple(r) for r in W.extract_responses(
            W.warc_payloads(docs, "doc_id", "text", "source")).collect())
    gz = sorted(
        tuple(r) for r in W.extract_responses(
            W.warc_gz_payloads(docs, "doc_id", "text", "source")).collect())
    assert gz == plain and len(plain) == docs.count()


# -- zstd (.warc.zst) seam: backend-gated (documented boundary in
# sources/warc.py — this container has neither compression.zstd nor
# the zstandard wheel, so the roundtrip tests skip here and activate
# wherever a backend exists) --------------------------------------------------

def test_zstd_boundary_without_backend():
    """With no backend: unzstd_members is the row drop (None), the
    builder raises the documented error, and a zstd-magic payload
    drops through extract_responses without poisoning the batch."""
    import pytest

    if W.zstd_backend() is not None:
        pytest.skip("zstd backend present: the roundtrip tests cover this")
    assert W.unzstd_members(b"\x28\xb5\x2f\xfd" + b"\x00" * 16) is None
    with pytest.raises(RuntimeError, match="zstd backend"):
        W.warc_zst_payloads(None, "id", "text", "source")


def test_zstd_members_roundtrip_and_torn():
    import pytest

    backend = W.zstd_backend()
    if backend is None:
        pytest.skip("no zstd backend in this environment")
    compress, _ = backend
    rec1 = W.build_response_record("https://a/1", b"A" * 40)
    rec2 = W.build_response_record("https://a/2", b"B" * 40)
    whole = compress(rec1) + compress(rec2)
    assert W.unzstd_members(whole) == rec1 + rec2
    # torn second frame keeps the first (record-granular policy)
    torn = compress(rec1) + compress(rec2)[:-8]
    assert W.unzstd_members(torn) == rec1
    assert W.unzstd_members(whole[:4]) is None


def test_spark_zst_payload_builder_matches_plain(spark):
    import pytest

    if W.zstd_backend() is None:
        pytest.skip("no zstd backend in this environment")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = sorted(
        tuple(r) for r in W.extract_responses(
            W.warc_payloads(docs, "doc_id", "text", "source")).collect())
    zst = sorted(
        tuple(r) for r in W.extract_responses(
            W.warc_zst_payloads(docs, "doc_id", "text", "source")).collect())
    assert zst == plain and len(plain) == docs.count()


# -- WET (.warc.wet.gz): conversion records, the plain-text sibling ----------

def test_wet_conversion_roundtrip():
    text = b"extracted plain text " * 4
    rec = W.build_conversion_record("https://a/1", text)
    records = W.parse_records(rec)
    assert len(records) == 1
    headers, block = records[0]
    assert headers["warc-type"] == "conversion"
    assert headers["content-type"] == "text/plain"
    assert block == text


def test_spark_wet_extract(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = W.extract_conversions(
        W.wet_payloads(docs, "doc_id", "text", "source")).collect()
    assert len(rows) == docs.count()
    by_id = {r["id"]: r for r in rows}
    src = {r["doc_id"]: r for r in docs.collect()}
    for i, r in by_id.items():
        raw = src[i]["text"].encode("utf-8")
        assert r["n_text_bytes"] == len(raw)
        assert r["prefix_sum"] == sum(raw[:W.WARC_PREFIX])
        assert r["url"].endswith(f"/doc/{i}")


def test_wet_response_records_do_not_leak_into_conversions(spark):
    """A mixed payload (response + conversion) must route each record
    to its own extractor only."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(3)
    wet = W.extract_conversions(
        W.warc_gz_payloads(docs, "doc_id", "text", "source")).collect()
    assert wet == []  # response-only payloads: no conversion records
    resp = W.extract_responses(
        W.wet_payloads(docs, "doc_id", "text", "source")).collect()
    assert resp == []  # conversion-only payloads: no response records


def test_zstdlib_differential_vs_real_zstd_cli():
    """The ctypes backend against the REAL zstd binary, both ways:
    frames we compress must decode with the reference implementation,
    and frames the reference compresses (several levels, incl. ones
    that exercise different block/table choices) must decode with our
    binding byte-identically."""
    import shutil
    import subprocess

    import pytest

    from distributed_computing_projects_spark.functions import (
        zstdlib as Z,
    )

    cli = shutil.which("zstd")
    if not Z.available() or cli is None:
        pytest.skip("libzstd or zstd CLI missing")
    payloads = [b"", b"x", b"A" * 100_000,
                bytes(range(256)) * 512,
                build_response_record_bytes()]
    for data in payloads:
        ours = Z.compress(data)
        ref = subprocess.run([cli, "-d", "-c"], input=ours,
                             capture_output=True, check=True).stdout
        assert ref == data
        for level in ("-1", "-9", "-19"):
            theirs = subprocess.run([cli, level, "-c"], input=data,
                                    capture_output=True, check=True).stdout
            d = Z.ZstdDecompressor()
            assert d.decompress(theirs, 1 << 28) == data and d.eof


def build_response_record_bytes() -> bytes:
    return W.build_response_record("https://x/1", b"body " * 2000)


# -- HTTP Content-Encoding (r13): gzip/deflate/br bodies ----------------------


def test_content_encoding_chain_decodes_and_drops():
    import zlib

    from distributed_computing_projects_spark.functions import (
        brotlilib as B,
    )

    body = b"the decoded body " * 10
    for ce in ("gzip", "deflate", "br", "gzip, br", "identity"):
        if "br" in ce and not B.available():
            continue
        rec = W.build_response_record("u", body, content_encoding=ce)
        _status, head, wire = W.split_http_response(
            W.parse_records(rec)[0][1])
        assert W.decode_content_encoding(head, wire) == body, ce
    # raw-deflate server quirk: body is a raw DEFLATE stream
    raw_deflate = zlib.compressobj(6, zlib.DEFLATED, -15).compress(body) \
        + zlib.compressobj(6, zlib.DEFLATED, -15).flush()
    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate"
    d = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw_deflate = d.compress(body) + d.flush()
    assert W.decode_content_encoding(head, raw_deflate) == body
    # unsupported coding, torn stream, bomb: record-granular drops
    assert W.decode_content_encoding(
        b"Content-Encoding: compress", b"xx") is None
    import gzip as _gz

    assert W.decode_content_encoding(
        b"Content-Encoding: gzip", _gz.compress(body)[:-4]) is None
    assert W.decode_content_encoding(
        b"Content-Encoding: gzip", _gz.compress(b"\x00" * (1 << 22)),
        max_bytes=1 << 10) is None
    # no header: body passes through untouched
    assert W.decode_content_encoding(b"HTTP/1.1 200 OK", body) == body


def test_spark_ce_payloads_match_plain(spark):
    import pytest

    from distributed_computing_projects_spark.functions import (
        brotlilib as B,
    )

    if not B.available():
        pytest.skip("no libbrotli in this environment")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = sorted(
        tuple(r) for r in W.extract_responses(
            W.warc_payloads(docs, "doc_id", "text", "source")).collect())
    ce = sorted(
        tuple(r) for r in W.extract_responses(
            W.warc_ce_payloads(docs, "doc_id", "text", "source")).collect())
    assert ce == plain and len(plain) == docs.count()


def test_ce_multi_member_gzip_body_decodes_in_full():
    """CDNs/proxies emit concatenated gzip members; a single-member
    inflate silently truncated the body (review finding)."""
    import gzip

    from distributed_computing_projects_spark.sources import warc as W

    body = gzip.compress(b"part1", mtime=0) + gzip.compress(b"part2",
                                                            mtime=0)
    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
    assert W.decode_content_encoding(head, body) == b"part1part2"
    # trailing non-member garbage after a clean member: tolerated and
    # ignored (warcio's policy — buggy servers pad gzip bodies)
    assert W.decode_content_encoding(
        head, gzip.compress(b"x", mtime=0) + b"GARBAGE") == b"x"
    # but a body that is garbage from byte 0 still drops whole
    assert W.decode_content_encoding(head, b"NOTGZIP") is None


def test_ce_repeated_header_lines_combine():
    """RFC 9110 §5.3: repeated Content-Encoding field lines combine
    into one list in order (review finding)."""
    from distributed_computing_projects_spark.sources import warc as W

    body = W.encode_http_body(b"payload", "gzip, br")
    head = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Content-Encoding: br")
    assert W.decode_content_encoding(head, body) == b"payload"


def test_extractors_share_one_walk():
    """Both extractors must consume iter_http_responses so a walk fix
    can never diverge between them."""
    import inspect

    from distributed_computing_projects_spark.sources import warc as W

    assert "iter_http_responses" in inspect.getsource(
        W.extract_responses)
    assert "iter_http_responses" in inspect.getsource(
        W.extract_response_bodies)
    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: x\r\n")
    resp = W.build_response_record("https://a/1", b"hello body")
    got = list(W.iter_http_responses(info + resp))
    assert got == [("https://a/1", 200, b"hello body")]


def test_ce_torn_second_gzip_member_keeps_complete_members():
    """A truncated SECOND gzip member decodes partially without a
    zlib.error, so the not-d.eof path must apply the same tolerated-
    tail policy as the except path: cut at the last complete member
    boundary. A torn FIRST member and the bomb bound stay whole-body
    drops (review finding)."""
    import gzip

    from distributed_computing_projects_spark.sources import warc as W

    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip"
    m1 = gzip.compress(b"part1", mtime=0)
    m2 = gzip.compress(b"part2-longer-payload" * 20, mtime=0)
    assert W.decode_content_encoding(head, m1 + m2[:-7]) == b"part1"
    # torn first member: nothing complete to keep
    assert W.decode_content_encoding(head, m1[:-3]) is None
    # bomb bound still drops the whole body even with a complete
    # first member banked
    big = gzip.compress(b"x" * 64, mtime=0)
    assert W.decode_content_encoding(head, m1 + big,
                                     max_bytes=32) is None
