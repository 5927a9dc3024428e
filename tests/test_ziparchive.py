"""ZIP archive source (sources/ziparchive.py): central-directory and
local-header-fallback walks, member-granular drop policies, the
deterministic builder round-trip, and the Spark read path."""

from __future__ import annotations

import zipfile

import pytest

import distributed_computing_projects_spark.sources.ziparchive as ZA
from distributed_computing_projects_spark.sources.ziparchive import (
    build_zip,
    iter_zip_members,
)


def _members(n):
    return [(f"{i:05d}.txt", b"doc %d body" % i) for i in range(n)]


@pytest.mark.parametrize("comp", [zipfile.ZIP_DEFLATED,
                                  zipfile.ZIP_STORED])
def test_roundtrip_both_compressions(comp):
    members = _members(40)
    assert list(iter_zip_members(build_zip(members, comp))) == members


def test_builder_deterministic():
    m = _members(5)
    assert build_zip(m) == build_zip(m)


def test_missing_central_directory_recovers_all_members():
    members = _members(40)
    data = build_zip(members)
    cd = data.find(b"PK\x01\x02")
    assert list(iter_zip_members(data[:cd])) == members


def test_torn_mid_member_keeps_complete_members():
    members = _members(40)
    data = build_zip(members)
    cd = data.find(b"PK\x01\x02")
    got = list(iter_zip_members(data[: int(cd * 0.6)]))
    assert 0 < len(got) < 40 and got == members[: len(got)]


def test_non_zip_and_empty_yield_nothing():
    assert list(iter_zip_members(b"not a zip")) == []
    assert list(iter_zip_members(b"")) == []
    assert list(iter_zip_members(b"PK\x03\x04" + b"\x00" * 10)) == []


def test_duplicate_names_last_wins():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # zipfile warns on duplicates
        dup = build_zip([("a.txt", b"one"), ("a.txt", b"two")])
    assert list(iter_zip_members(dup)) == [("a.txt", b"two")]


def test_member_bomb_and_encrypted_drop(monkeypatch):
    monkeypatch.setattr(ZA, "MAX_MEMBER_BYTES", 8)
    data = build_zip([("ok.txt", b"small"),
                      ("big.txt", b"way too large body here")])
    assert list(iter_zip_members(data)) == [("ok.txt", b"small")]
    # encrypted flag: set bit 0 in the central + local headers
    raw = bytearray(build_zip([("sec.txt", b"secret")],
                              zipfile.ZIP_STORED))
    for magic in (b"PK\x03\x04", b"PK\x01\x02"):
        at = raw.find(magic)
        flag_off = at + (6 if magic == b"PK\x03\x04" else 8)
        raw[flag_off] |= 0x01
    assert list(iter_zip_members(bytes(raw))) == []


def test_declared_size_mismatch_drops():
    data = bytearray(build_zip([("a.txt", b"abcdef")],
                               zipfile.ZIP_STORED))
    # lie about the uncompressed size in both headers
    for magic, off in ((b"PK\x03\x04", 22), (b"PK\x01\x02", 24)):
        at = data.find(magic)
        data[at + off:at + off + 4] = (3).to_bytes(4, "little")
    assert list(iter_zip_members(bytes(data))) == []


def test_read_zip_spark(spark, tmp_path):
    from distributed_computing_projects_spark.sources.ziparchive import (
        read_zip,
    )

    members = _members(12)
    (tmp_path / "d0.zip").write_bytes(build_zip(members[:6]))
    (tmp_path / "d1.zip").write_bytes(build_zip(members[6:]))
    (tmp_path / "junk.zip").write_bytes(b"garbage")
    rows = {r.name: bytes(r.content)
            for r in read_zip(spark, str(tmp_path)).collect()}
    assert rows == dict(members)
