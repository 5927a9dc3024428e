"""CBOR source (sources/cborfile.py): the RFC 8949 item walk —
indefinite-length containers, tags, float widths, duplicate-key
invalidity, bomb bounds, DDL adapters, Spark path."""

from __future__ import annotations

import struct

import pytest

import distributed_computing_projects_spark.sources.cborfile as CB
from distributed_computing_projects_spark.sources.cborfile import (
    build_cbor_sequence,
    encode,
    iter_cbor_values,
    read_cbor,
    timestamp,
)


def test_roundtrip_all_kinds():
    vals = [
        {"i": 7, "neg": -5, "big": 1 << 40, "nbig": -(1 << 40),
         "f": 2.5, "s": "héllo", "b": True, "nil": None,
         "blob": b"\x00\x01", "toks": [1, "two", None],
         "sub": {"k": 1}},
        {"u8": 200, "u16": 60000, "u32": 1 << 31, "u63": (1 << 62)},
    ]
    got = list(iter_cbor_values(build_cbor_sequence(vals)))
    assert got == vals


def test_indefinite_forms_roundtrip():
    vals = [{"s": "chunked text", "arr": [1, 2, 3],
             "m": {"a": 1, "b": 2}, "blob": b"chunked bytes"}] * 4
    data = build_cbor_sequence(vals, indefinite_every=2)
    got = list(iter_cbor_values(data))
    assert got == vals
    # hand-built nested indefinite: map{ s: indef-str, a: indef-arr }
    raw = (b"\xbf" + encode("s") + b"\x7f\x62ab\x61c\xff"
           + encode("a") + b"\x9f\x01\x02\xff" + b"\xff")
    assert list(iter_cbor_values(raw)) == [{"s": "abc", "a": [1, 2]}]


def test_float_widths_and_simples():
    # float16 1.5 = 0x3E00, float32 0.25, float64 2.5
    raw = (b"\xf9\x3e\x00" + b"\xfa" + struct.pack(">f", 0.25)
           + b"\xfb" + struct.pack(">d", 2.5)
           + b"\xf4\xf5\xf6\xf7")
    got = list(iter_cbor_values(raw))
    assert got[:3] == [1.5, 0.25, 2.5]
    assert got[3:6] == [False, True, None]
    assert isinstance(got[6], CB._Simple)  # undefined: opaque


def test_tags_timestamp_and_opaque():
    data = encode({"t": timestamp(1_700_000_000)})
    (got,) = iter_cbor_values(data)
    assert isinstance(got["t"], CB._Timestamp)
    assert got["t"].sec == 1_700_000_000
    # unknown tag: opaque wrapper, never silently unwrapped
    raw = b"\xa1" + encode("x") + b"\xc2\x42\x01\x02"  # tag 2 bignum
    (got,) = iter_cbor_values(raw)
    assert isinstance(got["x"], CB._Tag)
    assert got["x"].tag == 2


def test_duplicate_keys_drop_row_only():
    dup = b"\xa2" + encode("k") + encode(1) + encode("k") + encode(2)
    data = encode({"id": 1}) + dup + encode({"id": 2})
    got = list(iter_cbor_values(data))
    assert isinstance(got[1], CB._Invalid)
    keep = [v for v in got if isinstance(v, dict)]
    assert keep == [{"id": 1}, {"id": 2}]


def test_structural_failures_stop_stream():
    good = encode({"id": 1}) + encode({"id": 2})
    assert list(iter_cbor_values(good + encode({"id": 3})[:-1])) \
        == [{"id": 1}, {"id": 2}]
    # stray break at top level
    assert list(iter_cbor_values(good + b"\xff")) == \
        [{"id": 1}, {"id": 2}]
    # reserved additional info 28
    assert list(iter_cbor_values(good + bytes([0x1C]))) == \
        [{"id": 1}, {"id": 2}]
    # mixed chunk type inside an indefinite text
    bad = good + b"\x7f\x42ab\xff"
    assert list(iter_cbor_values(bad)) == [{"id": 1}, {"id": 2}]
    # declared length past EOF
    lie = good + b"\x5b" + struct.pack(">Q", 1 << 27)
    assert list(iter_cbor_values(lie)) == [{"id": 1}, {"id": 2}]


def test_bomb_bounds(monkeypatch):
    monkeypatch.setattr(CB, "MAX_VALUE_BYTES", 64)
    assert list(iter_cbor_values(encode({"s": "x" * 100}))) == []
    monkeypatch.setattr(CB, "MAX_VALUE_BYTES", 1 << 28)
    deep = {"k": None}
    for _ in range(100):
        deep = {"k": deep}
    assert list(iter_cbor_values(encode(deep))) == []


def test_property_roundtrip_arbitrary_values():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(1 << 64), max_value=(1 << 64) - 1),
        st.floats(allow_nan=False),
        st.text(max_size=40), st.binary(max_size=40))
    values = st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=6),
            st.dictionaries(st.text(max_size=8), kids, max_size=6)),
        max_leaves=25)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(values, max_size=5), st.integers(0, 3))
    def run(vals, indef_every):
        data = build_cbor_sequence(vals,
                                   indefinite_every=indef_every)
        assert list(iter_cbor_values(data)) == vals

    run()


def test_spark_read_with_ddl_adapters(tmp_path, spark):
    vals = [{"event_id": i, "user_id": 100 + i,
             "event_type": f"k{i % 3}",
             "value": None if i % 5 == 0 else i * 1.5,
             "ts": timestamp(1_700_000_000 + i),
             "writer_only": [1, {"deep": i}]}
            for i in range(40)]
    with open(tmp_path / "part-0.cbor", "wb") as f:
        f.write(build_cbor_sequence(vals, indefinite_every=4))
        f.write(encode({"event_id": 999})[:-1])  # torn tail
    with open(tmp_path / "junk.cbor", "wb") as f:
        f.write(bytes([0x1C]) + b"reserved ai leads")
    df = read_cbor(
        spark, str(tmp_path),
        "event_id bigint, user_id bigint, event_type string, "
        "value double, ts timestamp")
    got = sorted((r.event_id, r.user_id, r.event_type, r.value,
                  int(r.ts.timestamp())) for r in df.collect())
    assert got == [(i, 100 + i, f"k{i % 3}",
                    None if i % 5 == 0 else i * 1.5,
                    1_700_000_000 + i) for i in range(40)]


def test_cli_cbor_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    with open(tmp_path / "c.cbor", "wb") as f:
        f.write(build_cbor_sequence([{"id": 2, "name": "n2"}]))
    rc = main(["cbor-scan", str(tmp_path),
               "--ddl", "id bigint, name string"], spark=spark)
    assert rc == 0
    assert "n2" in capsys.readouterr().out
