"""Delta deletion vectors (sources/deltadv.py + the read_delta
integration): z85, the portable RoaringBitmapArray form, the sidecar
file layout, descriptor resolution, and the anti-join scan."""

from __future__ import annotations

import os
import struct
import uuid
import zlib

import pytest

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from distributed_computing_projects_spark.sources import deltadv as DV
from distributed_computing_projects_spark.sources import deltalake as DL

from tests.test_deltalake import SCHEMA, _write_file


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------- z85


def test_z85_zeromq_reference_vector():
    # the spec's own test case (rfc.zeromq.org/spec/32)
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert DV.z85_encode(data) == "HelloWorld"
    assert DV.z85_decode("HelloWorld") == data


def test_z85_round_trip_and_strictness():
    for n in (0, 4, 16, 64):
        data = bytes(range(n))
        assert DV.z85_decode(DV.z85_encode(data)) == data
    with pytest.raises(ValueError, match="multiple of 4"):
        DV.z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        DV.z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid z85"):
        DV.z85_decode("abc~d")
    with pytest.raises(ValueError, match="overflows"):
        DV.z85_decode("#####")  # 84 * 85^4 + ... > 2^32


# --------------------------------------------------------- roaring


def test_roaring_array_containers_round_trip():
    idx = [0, 1, 5, 100, 65535, 65536, 70000, 1 << 20]
    assert DV.decode_bitmap(DV.encode_bitmap(idx)) == sorted(idx)


def test_roaring_bitmap_container_round_trip():
    # > 4096 values in one 2^16 chunk forces the bitmap container
    idx = list(range(0, 10000, 2)) + [1 << 16 | 7]
    assert DV.decode_bitmap(DV.encode_bitmap(idx)) == sorted(idx)


def test_roaring_beyond_32_bits():
    # row indexes past 2^32 land in a second keyed bitmap
    idx = [3, (1 << 32) + 5, (3 << 32) + 9]
    assert DV.decode_bitmap(DV.encode_bitmap(idx)) == idx


def test_roaring_run_cookie_parses():
    """Hand-built run-container form (cookie 12347): the parser must
    read what OTHER writers emit even though ours never runs-encode.
    One run container [10..15] + one array container, 2 containers
    -> below the no-offset threshold, so NO offset header."""
    n = 2
    cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flags = bytes([0b01])  # container 0 is runs
    desc = struct.pack("<HH", 0, 6 - 1)          # key 0, card 6
    desc += struct.pack("<HH", 1, 2 - 1)         # key 1, card 2
    runs = struct.pack("<H", 1) + struct.pack("<HH", 10, 5)
    arr = struct.pack("<2H", 4, 9)
    rb32 = cookie + run_flags + desc + runs + arr
    data = (struct.pack("<iq", DV.MAGIC, 1)
            + struct.pack("<i", 0) + rb32)
    got = DV.decode_bitmap(data)
    assert got == [10, 11, 12, 13, 14, 15,
                   (1 << 16) + 4, (1 << 16) + 9]


def test_roaring_run_cookie_with_offsets():
    """>= 4 containers with the run cookie DO carry offsets."""
    n = 4
    cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flags = bytes([0b0000])  # all arrays
    desc = b"".join(struct.pack("<HH", k, 0) for k in range(4))
    offs = struct.pack("<4I", 0, 0, 0, 0)  # parser skips them
    arrs = b"".join(struct.pack("<H", k + 1) for k in range(4))
    rb32 = cookie + run_flags + desc + offs + arrs
    data = (struct.pack("<iq", DV.MAGIC, 1)
            + struct.pack("<i", 0) + rb32)
    assert DV.decode_bitmap(data) == [
        (k << 16) + k + 1 for k in range(4)]


def test_roaring_corruption_refuses():
    good = DV.encode_bitmap([1, 2, 3])
    with pytest.raises(ValueError, match="magic"):
        DV.decode_bitmap(b"\x00" * 16)
    with pytest.raises(ValueError, match="trailing"):
        DV.decode_bitmap(good + b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        DV.decode_bitmap(good[:-1])
    rb = DV._encode_rb32([3])
    out_of_order = (struct.pack("<iq", DV.MAGIC, 2)
                    + struct.pack("<i", 7) + rb
                    + struct.pack("<i", 2) + rb)
    with pytest.raises(ValueError, match="increasing"):
        DV.decode_bitmap(out_of_order)


# --------------------------------------------------- file + descr


def test_dv_file_layout_and_verification(tmp_path):
    p = str(tmp_path / "dv.bin")
    d1, d2 = DV.encode_bitmap([1, 5]), DV.encode_bitmap([2, 3, 9])
    off1, off2 = DV.write_dv_file(p, [d1, d2])
    assert off1 == 1  # right after the version byte
    assert DV.read_dv_payload(p, off1, len(d1)) == d1
    assert DV.read_dv_payload(p, off2, len(d2)) == d2
    with pytest.raises(ValueError, match="sizeInBytes"):
        DV.read_dv_payload(p, off1, len(d1) + 2)
    # flip one data byte -> CRC mismatch
    raw = bytearray(open(p, "rb").read())
    raw[off1 + 4 + 2] ^= 0xFF
    bad = str(tmp_path / "bad.bin")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        DV.read_dv_payload(bad, off1, len(d1))
    # wrong version byte
    raw[0] = 2
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="version"):
        DV.read_dv_payload(bad, off1, len(d1))


def test_inline_descriptor_round_trip(tmp_path):
    desc = DV.inline_descriptor([0, 2, 700])
    assert desc["storageType"] == "i"
    assert DV.resolve_dv(desc, str(tmp_path)) == [0, 2, 700]
    # cardinality mismatch refuses
    desc2 = dict(desc, cardinality=5)
    with pytest.raises(ValueError, match="cardinality"):
        DV.resolve_dv(desc2, str(tmp_path))


def test_u_storage_descriptor_with_prefix(tmp_path):
    table = str(tmp_path)
    descs = DV.file_descriptors(table, [[1, 2], [700]], prefix="ab")
    assert [d["cardinality"] for d in descs] == [2, 1]
    assert all(d["pathOrInlineDv"].startswith("ab") for d in descs)
    assert DV.resolve_dv(descs[0], table) == [1, 2]
    assert DV.resolve_dv(descs[1], table) == [700]
    # the sidecar actually lives under the prefix dir
    uid = uuid.UUID(bytes=DV.z85_decode(
        descs[0]["pathOrInlineDv"][2:]))
    assert os.path.exists(
        os.path.join(table, "ab", f"deletion_vector_{uid}.bin"))


def test_p_storage_and_unknown_type(tmp_path):
    data = DV.encode_bitmap([4])
    p = str(tmp_path / "abs.bin")
    (off,) = DV.write_dv_file(p, [data])
    desc = {"storageType": "p", "pathOrInlineDv": p, "offset": off,
            "sizeInBytes": len(data), "cardinality": 1}
    assert DV.resolve_dv(desc, "/nonexistent-table") == [4]
    with pytest.raises(ValueError, match="storageType"):
        DV.resolve_dv({"storageType": "x"}, str(tmp_path))


# ---------------------------------------------- read_delta scans


def _dv_table(spark, tmp_path):
    """Unpartitioned two-file table; v1 attaches DVs: a.parquet rows
    {0, 2} dead via INLINE, b.parquet row {1} dead via a sidecar."""
    table = str(tmp_path / "t")
    os.makedirs(table)
    data_schema = StructType(SCHEMA.fields)
    sa = _write_file(spark, table, "a.parquet",
                     [(1, "one"), (2, "two"), (3, "three")],
                     data_schema)
    sb = _write_file(spark, table, "b.parquet",
                     [(4, "four"), (5, "five")], data_schema)
    DL.commit_json(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        DL.metadata_action(SCHEMA, []),
        DL.add_action("a.parquet", {}, sa),
        DL.add_action("b.parquet", {}, sb),
    ])
    (sidecar,) = DV.file_descriptors(table, [[1]])
    DL.commit_json(table, 1, [
        DL.remove_action("a.parquet"),
        DL.add_action("a.parquet", {}, sa,
                      deletion_vector=DV.inline_descriptor([0, 2])),
        DL.remove_action("b.parquet"),
        DL.add_action("b.parquet", {}, sb,
                      deletion_vector=sidecar),
    ])
    return table


def test_dv_scan_removes_dead_rows(spark, tmp_path):
    table = _dv_table(spark, tmp_path)
    assert _collect(DL.read_delta(spark, table)) == [
        (2, "two"), (4, "four")]
    # time travel to v0: everything is back
    assert len(_collect(DL.read_delta(spark, table, version=0))) == 5


def test_dv_update_supersedes_and_checkpoint_carries(spark,
                                                     tmp_path):
    table = _dv_table(spark, tmp_path)
    # v2 GROWS a.parquet's DV (the remove+re-add update shape):
    # now rows {0, 1, 2} dead -> only b's surviving row remains + a
    # has none
    sa = os.path.getsize(os.path.join(table, "a.parquet"))
    DL.commit_json(table, 2, [
        DL.remove_action("a.parquet"),
        DL.add_action(
            "a.parquet", {}, sa,
            deletion_vector=DV.inline_descriptor([0, 1, 2])),
    ])
    assert _collect(DL.read_delta(spark, table)) == [(4, "four")]
    # checkpoint at v2 must PRESERVE both descriptors; wipe the
    # json commits it covers and re-read through the checkpoint
    DL.write_checkpoint(spark, table, 2)
    for v in range(3):
        os.remove(os.path.join(table, "_delta_log",
                               f"{v:020d}.json"))
    assert _collect(DL.read_delta(spark, table)) == [(4, "four")]
    snap = DL.resolve_snapshot(spark, table)
    assert len(snap.dvs) == 2


def test_dv_with_partition_columns(spark, tmp_path):
    """DV anti-join and broadcast partition attach share one scan."""
    table = str(tmp_path / "pt")
    os.makedirs(table)
    part_schema = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("b", StringType()),
    ])
    data_schema = StructType(part_schema.fields[:2])
    sizes = {}
    for b, rows in (("x", [(1, "one"), (2, "two")]),
                    ("y", [(3, "three"), (4, "four")])):
        sizes[b] = _write_file(spark, table, f"b={b}/f.parquet",
                               rows, data_schema)
    DL.commit_json(table, 0, [
        DL.protocol_action(),
        DL.metadata_action(part_schema, ["b"]),
        DL.add_action("b=x/f.parquet", {"b": "x"}, sizes["x"]),
        DL.add_action("b=y/f.parquet", {"b": "y"}, sizes["y"]),
    ])
    DL.commit_json(table, 1, [
        DL.remove_action("b=y/f.parquet"),
        DL.add_action("b=y/f.parquet", {"b": "y"}, sizes["y"],
                      deletion_vector=DV.inline_descriptor([0])),
    ])
    # wait: both files are named f.parquet -> basename collision
    # with a DV must REFUSE (documented policy)
    with pytest.raises(ValueError, match="colliding"):
        DL.read_delta(spark, table)


def test_dv_partitioned_unique_names(spark, tmp_path):
    table = str(tmp_path / "pu")
    os.makedirs(table)
    part_schema = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("b", StringType()),
    ])
    data_schema = StructType(part_schema.fields[:2])
    sx = _write_file(spark, table, "b=x/fx.parquet",
                     [(1, "one"), (2, "two")], data_schema)
    sy = _write_file(spark, table, "b=y/fy.parquet",
                     [(3, "three"), (4, "four")], data_schema)
    DL.commit_json(table, 0, [
        DL.protocol_action(),
        DL.metadata_action(part_schema, ["b"]),
        DL.add_action("b=x/fx.parquet", {"b": "x"}, sx),
        DL.add_action("b=y/fy.parquet", {"b": "y"}, sy),
    ])
    DL.commit_json(table, 1, [
        DL.remove_action("b=y/fy.parquet"),
        DL.add_action("b=y/fy.parquet", {"b": "y"}, sy,
                      deletion_vector=DV.inline_descriptor([1])),
    ])
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, "one", "x"), (2, "two", "x"),
                   (3, "three", "y")]
    # partition pruning composes with the DV anti-join
    assert _collect(DL.read_delta(spark, table,
                                  partitions={"b": "y"})) == [
        (3, "three", "y")]


def test_dv_torn_sidecar_refuses(spark, tmp_path):
    table = _dv_table(spark, tmp_path)
    # truncate the sidecar mid-payload
    snap = DL.resolve_snapshot(spark, table)
    desc = snap.dvs[os.path.join(table, "b.parquet")]
    tok = desc["pathOrInlineDv"]
    uid = uuid.UUID(bytes=DV.z85_decode(tok[-20:]))
    sidecar = os.path.join(table, DV.dv_file_name(tok[:-20], uid))
    raw = open(sidecar, "rb").read()
    open(sidecar, "wb").write(raw[:len(raw) - 3])
    with pytest.raises(ValueError, match="truncated"):
        DL.read_delta(spark, table).collect()


def test_dv_composes_with_column_mapping(spark, tmp_path):
    """Both modern-table features on one scan: physical-name files
    + a DV killing rows, read back under logical names."""
    import json

    table = str(tmp_path / "cmdv")
    os.makedirs(table)
    phys = StructType([StructField("col-k", LongType()),
                       StructField("col-v", StringType())])
    size = _write_file(spark, table, "f.parquet",
                       [(1, "a"), (2, "b"), (3, "c")], phys)
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-k"}},
        {"name": "v", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-v"}},
    ]
    meta = {"metaData": {
        "id": "0" * 32,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct",
                                    "fields": fields}),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name"},
        "createdTime": 0}}
    DL.commit_json(table, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping",
                                         "deletionVectors"],
                      "writerFeatures": []}},
        meta,
        DL.add_action("f.parquet", {}, size,
                      deletion_vector=DV.inline_descriptor([1])),
    ])
    df = DL.read_delta(spark, table)
    assert df.columns == ["k", "v"]
    assert _collect(df) == [(1, "a"), (3, "c")]
    # and delete_where over the mapped table grows the vector
    DL.delete_where(spark, table, "k = 3")
    assert _collect(DL.read_delta(spark, table)) == [(1, "a")]


def test_delete_where_publishes_dvs(spark, tmp_path):
    table = str(tmp_path / "dw")
    df = spark.createDataFrame(
        [(i, f"v{i}", "x" if i < 4 else "y") for i in range(8)],
        "k bigint, v string, b string")
    DL.write_delta(df, table, partition_by=["b"])
    ver = DL.delete_where(spark, table, "k % 2 = 1")
    assert _collect(DL.read_delta(spark, table)) == [
        (0, "v0", "x"), (2, "v2", "x"), (4, "v4", "y"),
        (6, "v6", "y")]
    snap = DL.resolve_snapshot(spark, table)
    assert snap.dvs  # no data file rewritten: bitmaps attached
    # the protocol now advertises the feature (spec: v3 + v7)
    assert snap.protocol["minReaderVersion"] == 3
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    # time travel to just before the delete sees every row
    assert len(_collect(DL.read_delta(spark, table,
                                      version=ver - 1))) == 8
    # a second delete GROWS the vector (never loses the first)
    DL.delete_where(spark, table, "k = 2")
    assert _collect(DL.read_delta(spark, table)) == [
        (0, "v0", "x"), (4, "v4", "y"), (6, "v6", "y")]
    # a delete covering a file's every remaining row drops the FILE
    # (bare remove, no all-ones bitmap)
    DL.delete_where(spark, table, "b = 'y'")
    assert _collect(DL.read_delta(spark, table)) == [(0, "v0", "x")]
    snap2 = DL.resolve_snapshot(spark, table)
    assert all(pv.get("b") != "y" for _p, pv in snap2.files)
    with pytest.raises(ValueError, match="matched no rows"):
        DL.delete_where(spark, table, "k = 999")


def test_optimize_compacts_and_materializes_dvs(spark, tmp_path):
    table = str(tmp_path / "opt")
    df = spark.createDataFrame(
        [(i, f"v{i}", "x" if i % 2 == 0 else "y")
         for i in range(10)],
        "k bigint, v string, b string")
    # two single-task appends -> exactly 2 files per partition
    DL.write_delta(df.filter("k < 5").coalesce(1), table,
                   partition_by=["b"])
    DL.write_delta(df.filter("k >= 5").coalesce(1), table,
                   partition_by=["b"])
    DL.delete_where(spark, table, "k IN (2, 3)")
    before = DL.resolve_snapshot(spark, table)
    assert len(before.files) >= 4 and before.dvs
    ver = DL.optimize(spark, table)
    after = DL.resolve_snapshot(spark, table)
    # one file per partition, no deletion vectors left
    assert len(after.files) == 2
    assert not after.dvs
    got = _collect(DL.read_delta(spark, table))
    assert got == sorted(
        (i, f"v{i}", "x" if i % 2 == 0 else "y")
        for i in range(10) if i not in (2, 3))
    # dead rows are PHYSICALLY gone from the new files
    raw = spark.read.parquet(*[p for p, _pv in after.files])
    assert raw.count() == 8
    # layout-only commit: time travel before OPTIMIZE still works
    assert len(_collect(DL.read_delta(spark, table,
                                      version=ver - 1))) == 8
    # nothing left to compact -> no empty commit
    assert DL.optimize(spark, table) == -1


def test_restore_version_rolls_back_as_new_commit(spark, tmp_path):
    table = str(tmp_path / "rst")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k bigint, v string")
    v0 = DL.write_delta(df.filter("k < 3"), table)
    v1 = DL.write_delta(df.filter("k >= 3"), table)
    v2 = DL.delete_where(spark, table, "k IN (1, 4)")
    assert (v0, v1, v2) == (0, 1, 2)
    assert len(_collect(DL.read_delta(spark, table))) == 4
    # restore to v1: the delete rolls back, files untouched
    v3 = DL.restore_version(spark, table, v1)
    assert v3 == 3
    assert len(_collect(DL.read_delta(spark, table))) == 6
    # restore to v0: the second append rolls back too
    DL.restore_version(spark, table, v0)
    assert _collect(DL.read_delta(spark, table)) == [
        (0, "v0"), (1, "v1"), (2, "v2")]
    # the restored-over history is still time-travelable
    assert len(_collect(DL.read_delta(spark, table,
                                      version=v2))) == 4
    # restoring to the current state is a no-op, not a commit
    cur = DL.resolve_snapshot(spark, table).version
    assert DL.restore_version(spark, table, cur) == cur


def test_incremental_read_tails_appends(spark, tmp_path):
    table = str(tmp_path / "inc")
    df = spark.createDataFrame(
        [(i, f"v{i}", "x" if i % 2 == 0 else "y")
         for i in range(9)],
        "k bigint, v string, b string")
    v0 = DL.write_delta(df.filter("k < 3"), table,
                        partition_by=["b"])
    v1 = DL.write_delta(df.filter("k >= 3 AND k < 6"), table,
                        partition_by=["b"])
    v2 = DL.write_delta(df.filter("k >= 6"), table,
                        partition_by=["b"])
    got = sorted(tuple(r) for r in DL.read_delta_changes(
        spark, table, v0).collect())
    assert [r[0] for r in got] == [3, 4, 5, 6, 7, 8]
    assert got[0] == (3, "v3", "y")  # partition values attach
    got01 = DL.read_delta_changes(spark, table, v0, v1).collect()
    assert sorted(r.k for r in got01) == [3, 4, 5]
    # optimize's dataChange=false swap is invisible to consumers
    DL.optimize(spark, table)
    v4 = DL.write_delta(df.filter("k < 1"), table,
                        partition_by=["b"])
    tail = DL.read_delta_changes(spark, table, v4 - 1, v4).collect()
    assert sorted(r.k for r in tail) == [0]
    # a data-changing delete in the range refuses loudly
    DL.delete_where(spark, table, "k = 4")
    with pytest.raises(ValueError, match="deletion vector|removes"):
        DL.read_delta_changes(spark, table, v2)
    cur = DL.resolve_snapshot(spark, table).version
    with pytest.raises(ValueError, match="empty incremental"):
        DL.read_delta_changes(spark, table, cur, cur)


def test_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    table = str(tmp_path / "vac")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k bigint, v string")
    DL.write_delta(df.coalesce(1), table)
    DL.write_delta(df.coalesce(1), table, mode="overwrite")
    DL.delete_where(spark, table, "k = 1")  # keeps a live sidecar
    # an orphan parquet and a stray DV sidecar
    open(os.path.join(table, "deletion_vector_junk.bin"),
         "wb").write(b"\x01junk")
    snap = DL.resolve_snapshot(spark, table)
    plan = DL.vacuum(spark, table, dry_run=True)
    assert plan  # the overwritten v0 file + the stray .bin at least
    assert "deletion_vector_junk.bin" in plan
    # dry run touched nothing
    assert os.path.exists(os.path.join(
        table, "deletion_vector_junk.bin"))
    gone = DL.vacuum(spark, table)
    assert gone == plan
    # current snapshot reads unaffected, live DV sidecar survived
    assert len(_collect(DL.read_delta(spark, table))) == 5
    snap2 = DL.resolve_snapshot(spark, table)
    assert snap2.dvs
    # history whose files were reclaimed: restore detects loudly
    with pytest.raises(ValueError, match="vanished"):
        DL.restore_version(spark, table, 0)


def test_rename_and_add_column_metadata_only(spark, tmp_path):
    table = str(tmp_path / "alter")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k bigint, v string, "
                                        "b string")
    DL.write_delta(df.coalesce(1), table, partition_by=["b"])
    files_before = sorted(
        p for p, _pv in DL.resolve_snapshot(spark, table).files)
    v1 = DL.rename_column(spark, table, "v", "label")
    got = DL.read_delta(spark, table)
    assert got.columns == ["k", "label", "b"]
    assert _collect(got) == [(1, "a", "x"), (2, "b", "y")]
    # metadata-only: identical data files, mapping now on
    snap = DL.resolve_snapshot(spark, table)
    assert sorted(p for p, _pv in snap.files) == files_before
    assert snap.column_mapping == {"k": "k", "label": "v",
                                   "b": "b"}
    # time travel to before the rename: old logical name
    assert DL.read_delta(spark, table,
                         version=v1 - 1).columns == ["k", "v", "b"]
    # rename a PARTITION column too
    DL.rename_column(spark, table, "b", "bucket")
    got2 = DL.read_delta(spark, table)
    assert got2.columns == ["k", "label", "bucket"]
    assert _collect(DL.read_delta(spark, table,
                                  partitions={"bucket": "y"})) == [
        (2, "b", "y")]
    # add a column: pre-existing files null it
    DL.add_column(spark, table, "score", "double")
    got3 = DL.read_delta(spark, table)
    assert got3.columns == ["k", "label", "bucket", "score"]
    assert all(r.score is None for r in got3.collect())
    # delete_where still composes on the fully-evolved table
    DL.delete_where(spark, table, "label = 'a'")
    assert _collect(DL.read_delta(spark, table)) == [
        (2, "b", "y", None)]
    with pytest.raises(ValueError, match="already exists"):
        DL.rename_column(spark, table, "k", "label")
    with pytest.raises(ValueError, match="already exists"):
        DL.add_column(spark, table, "k", "bigint")


def test_cli_lake_maint(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    table = str(tmp_path / "cli")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k bigint, v string")
    DL.write_delta(df.coalesce(1), table)
    rc = main(["lake-maint", "delta-delete", table,
               "--where", "k % 2 = 1"], spark=spark)
    assert rc == 0
    assert "committed version 1" in capsys.readouterr().out
    rc = main(["lake-maint", "delta-optimize", table], spark=spark)
    assert rc == 0
    rc = main(["lake-maint", "delta-vacuum", table, "--dry-run"],
              spark=spark)
    assert rc == 0
    assert capsys.readouterr()  # plan printed
    v = DL.write_delta(
        spark.createDataFrame([(10, "ten")], "k bigint, v string"),
        table)
    rc = main(["lake-maint", "delta-changes", table,
               "--version", str(v - 1)], spark=spark)
    assert rc == 0
    assert "ten" in capsys.readouterr().out
    assert len(_collect(DL.read_delta(spark, table))) == 4


def test_crc32_matches_zlib():
    # the file layout stores CRC-32 of the bitmap data; sanity-pin
    # the polynomial choice against a known vector
    assert zlib.crc32(b"123456789") == 0xCBF43926
