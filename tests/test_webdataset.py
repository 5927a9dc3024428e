"""WebDataset tar-shard source (sources/webdataset.py): key/part
grouping rules, sample-granular torn/bomb drops, deterministic shard
builder round-trip, and the Spark (key, parts) read path."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.webdataset as W
from distributed_computing_projects_spark.sources.webdataset import (
    build_shard,
    iter_samples,
    split_key,
)


def _samples(n):
    return [(f"{i:05d}", {"txt": b"text %d" % i, "cls": b"%d" % (i % 7),
                          "meta.json": b'{"i": %d}' % i})
            for i in range(n)]


def test_split_key_first_dot_rule():
    assert split_key("00042.jpg") == ("00042", "jpg")
    assert split_key("00042.meta.json") == ("00042", "meta.json")
    assert split_key("dir/sub/00042.txt") == ("dir/sub/00042", "txt")
    assert split_key("nodot") == ("nodot", "")


def test_shard_roundtrip_preserves_groups_and_order():
    samples = _samples(40)
    assert list(iter_samples(build_shard(samples))) == samples


def test_shard_bytes_deterministic():
    samples = _samples(5)
    assert build_shard(samples) == build_shard(samples)


def test_torn_shard_keeps_complete_samples():
    samples = _samples(50)
    shard = build_shard(samples)
    # 3 members/sample, 1024 B each (512 header + padded body)
    torn = shard[: 10 * 3 * 1024 + 700]
    got = list(iter_samples(torn))
    assert got == samples[:10]


def test_non_tar_and_empty_yield_nothing():
    assert list(iter_samples(b"this is not a tar")) == []
    assert list(iter_samples(b"")) == []
    assert list(iter_samples(b"\x00" * 1024)) == []


def test_bomb_member_drops_its_whole_sample(monkeypatch):
    monkeypatch.setattr(W, "MAX_MEMBER_BYTES", 8)
    samples = [("a", {"txt": b"ok", "cls": b"1"}),
               ("b", {"txt": b"way too large body", "cls": b"2"}),
               ("c", {"txt": b"fine", "cls": b"3"})]
    got = list(iter_samples(build_shard(samples)))
    # b's oversized txt poisons the WHOLE b sample, a and c survive
    assert [k for k, _ in got] == ["a", "c"]


def test_duplicate_part_last_wins():
    import io
    import tarfile

    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        for body in (b"first", b"second"):
            info = tarfile.TarInfo(name="k.txt")
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    got = list(iter_samples(out.getvalue()))
    assert got == [("k", {"txt": b"second"})]


def test_read_webdataset_spark(spark, tmp_path):
    from distributed_computing_projects_spark.sources.webdataset import (
        read_webdataset,
    )

    samples = _samples(12)
    (tmp_path / "s0.tar").write_bytes(build_shard(samples[:6]))
    (tmp_path / "s1.tar").write_bytes(build_shard(samples[6:]))
    (tmp_path / "junk.tar").write_bytes(b"not a tar")
    df = read_webdataset(spark, str(tmp_path))
    rows = {r.key: dict(r.parts) for r in df.collect()}
    assert len(rows) == 12
    assert rows["00003"]["txt"] == bytearray(b"text 3")
    assert rows["00011"]["meta.json"] == bytearray(b'{"i": 11}')


def test_webdataset_feeds_multimodal_decode(spark, tmp_path):
    """The generic parts map composes with the image decode tier —
    the actual multimodal-pipeline shape (image bytes per sample)."""
    from distributed_computing_projects_spark.operators import (
        multimodal as M,
    )
    from distributed_computing_projects_spark.sources.webdataset import (
        read_webdataset,
    )
    from pyspark.sql import functions as F

    rgb = bytes(range(36))
    ppm = b"P6\n4 3\n255\n" + rgb
    (tmp_path / "s.tar").write_bytes(
        build_shard([("7", {"ppm": ppm, "txt": b"caption"})]))
    wd = read_webdataset(spark, str(tmp_path))
    payloads = wd.select(
        F.col("key").cast("bigint").alias("id"),
        F.col("parts").getItem("ppm").alias("payload"))
    row = M.decode_image(payloads).collect()[0]
    assert (row["id"], row["width"], row["height"]) == (7, 4, 3)
    assert row["sum_r"] == sum(rgb[0::3])
