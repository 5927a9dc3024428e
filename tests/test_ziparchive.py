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


def test_members_stream_one_at_a_time(monkeypatch):
    """iter_zip_members must yield as it decodes — buffering every
    body before the first yield made aggregate memory per archive
    unbounded and defeated read_zip's batch flush (review finding).
    Both walks: after pulling ONE member, at most one body has been
    decoded."""
    members = _members(40)
    data = build_zip(members)

    reads = []
    real_read = zipfile.ZipFile.read

    def counting_read(self, *a, **k):
        reads.append(1)
        return real_read(self, *a, **k)

    monkeypatch.setattr(zipfile.ZipFile, "read", counting_read)
    gen = iter_zip_members(data)
    assert next(gen) == members[0]
    assert len(reads) == 1
    assert list(gen) == members[1:]

    inflates = []
    real_inflate = ZA._inflate_member
    monkeypatch.setattr(
        ZA, "_inflate_member",
        lambda *a: inflates.append(1) or real_inflate(*a))
    cd = data.find(b"PK\x01\x02")
    gen = iter_zip_members(data[:cd])  # local-header fallback
    assert next(gen) == members[0]
    assert len(inflates) == 1
    assert list(gen) == members[1:]


def test_duplicate_with_corrupt_winner_drops_the_name():
    """Metadata-level last-wins dedupe: the shadowing occurrence is
    the member, defects included — a corrupt winner drops the name
    rather than resurrecting the shadowed body (zip semantics)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dup = bytearray(build_zip([("a.txt", b"good-one"),
                                   ("a.txt", b"bad-body")],
                                  zipfile.ZIP_STORED))
    # corrupt the SECOND occurrence's bytes so its CRC check fails
    at = dup.rfind(b"bad-body")
    dup[at:at + 3] = b"XXX"
    assert list(iter_zip_members(bytes(dup))) == []
