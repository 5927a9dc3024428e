"""Protobuf delimited-stream source (sources/pbstream.py): the
schema-free wire walk, field-map interpretation, packed repeateds,
zigzag, drop granularity, Spark path."""

from __future__ import annotations

import struct

import pytest

import distributed_computing_projects_spark.sources.pbstream as PB
from distributed_computing_projects_spark.sources.pbstream import (
    build_pbstream,
    encode_message,
    iter_delimited,
    read_pbstream,
    walk_message,
)


def _msg(i):
    return encode_message([
        (1, "int", i), (2, "string", f"name-{i}"),
        (3, "double", i * 1.5), (4, "bool", i % 2),
        (9, "string", "writer-only extension"),  # unknown: skipped
    ])


def test_wire_walk_and_framing():
    data = build_pbstream([_msg(0), _msg(1)])
    msgs = [walk_message(m) for m in iter_delimited(data)]
    assert len(msgs) == 2
    assert msgs[1][1] == [(0, 1)]
    assert msgs[1][2][0][1] == b"name-1"
    assert struct.unpack("<d", msgs[1][3][0][1])[0] == 1.5
    assert 9 in msgs[0]  # walk keeps unknowns; adapters ignore


def test_negative_zigzag_and_i64():
    m = encode_message([(1, "int", -5 & ((1 << 64) - 1)),
                        (2, "sint", -5)])
    got = walk_message(m)
    assert PB._to_i64(got[1][0][1]) == -5
    assert PB._unzigzag(got[2][0][1]) == -5


def test_record_drop_vs_stream_stop():
    good = [_msg(0), _msg(1)]
    # malformed INNER message: wire walk fails but the length frame
    # still locates the next record
    bad = PB._enc_uvarint(1 << 3 | 3)  # group wire type
    data = build_pbstream([good[0], bad, good[1]])
    msgs = [walk_message(m) for m in iter_delimited(data)]
    assert [m is None for m in msgs] == [False, True, False]
    # torn tail / absurd declared length: stream stops
    torn = build_pbstream(good) + PB._enc_uvarint(50) + b"short"
    assert len(list(iter_delimited(torn))) == 2
    lie = build_pbstream(good) + PB._enc_uvarint(1 << 40)
    assert len(list(iter_delimited(lie))) == 2


def test_packed_and_repeated_arrays(spark, tmp_path):
    msgs = [
        encode_message([(1, "int", 1),
                        (5, "packed_int", [1, 2, 3]),
                        (6, "packed_double", [0.5, 1.5])]),
        encode_message([(1, "int", 2),
                        (5, "int", 7), (5, "int", 8),   # unpacked
                        (6, "double", 2.5)]),
    ]
    with open(tmp_path / "a.pb", "wb") as f:
        f.write(build_pbstream(msgs))
    df = read_pbstream(
        spark, str(tmp_path),
        "k bigint, ints array<bigint>, ds array<double>",
        {"k": 1, "ints": 5, "ds": 6})
    got = {r.k: (r.ints, r.ds) for r in df.collect()}
    assert got[1] == ([1, 2, 3], [0.5, 1.5])
    assert got[2] == ([7, 8], [2.5])


def test_float_cells_and_packed_floats(spark, tmp_path):
    # float DDL reads fixed32 exactly, downcasts a fixed64 double,
    # and takes the packed form — closing the docstring/CLI promise
    # that float-typed cells read fixed32 (previously only 'double'
    # had a branch and float columns silently nulled)
    msgs = [
        encode_message([(1, "int", 1), (2, "float", 2.5),
                        (3, "packed_float", [0.5, 1.25, -3.0])]),
        encode_message([(1, "int", 2), (2, "double", 7.5),
                        (3, "float", 9.5)]),
        encode_message([(1, "int", 3), (2, "string", "not-a-num")]),
    ]
    with open(tmp_path / "f.pb", "wb") as f:
        f.write(build_pbstream(msgs))
    df = read_pbstream(
        spark, str(tmp_path), "k bigint, v float, vs array<float>",
        {"k": 1, "v": 2, "vs": 3})
    got = {r.k: (r.v, r.vs) for r in df.collect()}
    assert got[1] == (2.5, [0.5, 1.25, -3.0])
    assert got[2] == (7.5, [9.5])
    assert got[3] == (None, None)  # mis-typed cell nulls


def test_spark_read_with_field_map(spark, tmp_path):
    msgs = [_msg(i) for i in range(40)]
    with open(tmp_path / "part-0.pb", "wb") as f:
        f.write(build_pbstream(msgs))
        f.write(PB._enc_uvarint(99))  # torn tail
    with open(tmp_path / "junk.pb", "wb") as f:
        f.write(b"\xff" * 20)  # varint runs past end: stream stop
    df = read_pbstream(
        spark, str(tmp_path),
        "event_id bigint, name string, value double, flag boolean",
        {"event_id": 1, "name": 2, "value": 3, "flag": 4})
    got = sorted((r.event_id, r.name, r.value, r.flag)
                 for r in df.collect())
    assert got == [(i, f"name-{i}", i * 1.5, bool(i % 2))
                   for i in range(40)]
    with pytest.raises(ValueError, match="no field number"):
        read_pbstream(spark, str(tmp_path), "x bigint", {})


def test_cli_pb_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    with open(tmp_path / "c.pb", "wb") as f:
        f.write(build_pbstream([encode_message(
            [(1, "int", 2), (2, "string", "n2")])]))
    rc = main(["pb-scan", str(tmp_path),
               "--ddl", "id bigint, name string",
               "--field", "id=1", "--field", "name=2"], spark=spark)
    assert rc == 0
    assert "n2" in capsys.readouterr().out
