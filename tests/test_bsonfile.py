"""BSON source (sources/bsonfile.py): the size-framed document walk
(record-vs-stream drop granularity), element decode across the type
table, DDL resolution with per-cell nulls, and the Spark path."""

from __future__ import annotations

import struct

import pytest

import distributed_computing_projects_spark.sources.bsonfile as BS
from distributed_computing_projects_spark.sources.bsonfile import (
    build_bson_doc,
    build_bson_dump,
    iter_bson_docs,
    parse_document,
    read_bson,
)


def test_roundtrip_all_kinds():
    doc = parse_document(build_bson_doc(
        {"i": 7, "big": 1 << 40, "f": 2.5, "s": "héllo", "b": True,
         "nil": None, "blob": b"\x00\x01", "toks": [1, 2, 3],
         "sub": {"k": 1}}))
    assert doc["i"] == (0x10, 7)
    assert doc["big"] == (0x12, 1 << 40)
    assert doc["f"] == (0x01, 2.5)
    assert doc["s"] == (0x02, "héllo")
    assert doc["b"] == (0x08, True)
    assert doc["nil"] == (0x0A, None)
    assert doc["blob"] == (0x05, b"\x00\x01")
    assert doc["toks"][0] == 0x04
    assert doc["sub"][0] == 0x03


def test_spec_type_table_decodes():
    """Hand-built elements for the types the builder does not emit:
    ObjectId, UTC datetime, symbol, Decimal128 (nulls), regex."""
    body = (bytes([0x07]) + b"oid\x00" + bytes(range(12))
            + bytes([0x09]) + b"dt\x00"
            + struct.pack("<q", 1_700_000_000_000)
            + bytes([0x0E]) + b"sym\x00"
            + struct.pack("<i", 3) + b"ab\x00"
            + bytes([0x13]) + b"dec\x00" + b"\x00" * 16
            + bytes([0x0B]) + b"re\x00" + b"pat\x00opts\x00")
    doc = struct.pack("<i", len(body) + 5) + body + b"\x00"
    got = parse_document(doc)
    assert got["oid"] == (0x07, bytes(range(12)))
    assert got["dt"] == (0x09, 1_700_000_000_000)
    assert got["sym"] == (0x0E, "ab")
    assert got["dec"] == (0x13, None)
    assert got["re"] == (0x0B, None)


def test_malformed_elements_drop_record_only():
    bad_body = bytes([0xEE]) + b"x\x00"
    bad = struct.pack("<i", len(bad_body) + 5) + bad_body + b"\x00"
    mixed = (build_bson_doc({"id": 1}) + bad
             + build_bson_doc({"id": 2}))
    parsed = [parse_document(r) for r in iter_bson_docs(mixed)]
    assert [p["id"][1] if p else None for p in parsed] == [1, None, 2]


def test_framing_stops_on_absurd_size_and_torn_tail():
    dump = build_bson_dump([{"id": i} for i in range(10)])
    assert len(list(iter_bson_docs(dump[:-4]))) == 9
    assert list(iter_bson_docs(b"\x02\x00\x00\x00\x00" * 4)) == []
    assert list(iter_bson_docs(b"junk, not bson at all")) == []
    # missing terminator byte: framing untrusted
    broken = bytearray(dump)
    (size,) = struct.unpack_from("<i", broken, 0)
    broken[size - 1] = 0x07
    assert list(iter_bson_docs(bytes(broken))) == []


def test_bomb_and_depth_bounds(monkeypatch):
    monkeypatch.setattr(BS, "MAX_DOC_BYTES", 64)
    big = build_bson_doc({"s": "x" * 100})
    assert list(iter_bson_docs(big)) == []
    monkeypatch.setattr(BS, "MAX_DOC_BYTES", 1 << 28)
    deep = {"k": 1}
    for _ in range(100):
        deep = {"d": deep}
    assert parse_document(build_bson_doc(deep)) is None


def test_spark_ddl_resolution(spark, tmp_path):
    """Writer-only fields discard, reader-only columns null,
    mis-typed cells null, ObjectId -> hex string, datetime -> tz
    instant, array<bigint> adapts elementwise."""
    docs = build_bson_dump([
        {"id": 1, "name": "a", "v": 1.5, "toks": [1, 2],
         "extra": {"drop": "me"}},
        {"id": 2, "name": 7, "v": 3, "toks": [3]},  # name mis-typed
    ])
    oid_body = (bytes([0x10]) + b"id\x00" + struct.pack("<i", 3)
                + bytes([0x07]) + b"name\x00" + bytes(range(12))
                + bytes([0x09]) + b"when\x00"
                + struct.pack("<q", 86_400_000))
    docs += struct.pack("<i", len(oid_body) + 5) + oid_body + b"\x00"
    (tmp_path / "c.bson").write_bytes(docs)
    (tmp_path / "junk.bson").write_bytes(b"junk")
    df = read_bson(
        spark, str(tmp_path),
        "id bigint, name string, v double, toks array<bigint>, "
        "when timestamp, ghost double")
    rows = {r.id: (r.name, r.v, list(r.toks or []), r.when, r.ghost)
            for r in df.collect()}
    assert rows[1] == ("a", 1.5, [1, 2], None, None)
    assert rows[2] == (None, 3.0, [3], None, None)  # int widens to dbl
    name, v, toks, when, ghost = rows[3]
    assert name == bytes(range(12)).hex() and when.day == 2
    assert v is None and toks == [] and ghost is None


def test_cli_bson_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    (tmp_path / "c.bson").write_bytes(build_bson_dump(
        [{"id": i, "name": f"n{i}"} for i in range(3)]))
    rc = main(["bson-scan", str(tmp_path),
               "--ddl", "id bigint, name string"], spark=spark)
    assert rc == 0
    assert "n2" in capsys.readouterr().out
