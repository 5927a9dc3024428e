"""Hudi MERGE_ON_READ reader (sources/hudimor.py): log-block framing,
the completed-instant visibility filter, rollback command blocks,
torn tails, the _hoodie_is_deleted sentinel, compaction slicing, and
the base+log window merge."""

from __future__ import annotations

import os
import shutil
import struct

import pytest

from distributed_computing_projects_spark.sources import avro as AV
from distributed_computing_projects_spark.sources import hudi as HU
from distributed_computing_projects_spark.sources import hudimor as M


AVSCHEMA = {"type": "record", "name": "r", "fields": [
    {"name": "k", "type": ["null", "long"]},
    {"name": "v", "type": ["null", "string"]},
    {"name": "_hoodie_is_deleted", "type": ["null", "boolean"]},
]}
DDL = "k bigint, v string"


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _write_base(spark, table, rel, rows):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    schema = StructType([StructField("k", LongType()),
                         StructField("v", StringType())])
    stage = os.path.join(table, rel + ".stage")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    part = next(n for n in sorted(os.listdir(stage))
                if n.startswith("part-") and n.endswith(".parquet"))
    dest = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)
    shutil.rmtree(stage, ignore_errors=True)


def _mor_table(spark, tmp_path):
    """001 commit: base g0 {1:one, 2:two}; 002 deltacommit: upsert
    k=2 -> TWO, insert k=3; 003 deltacommit: delete k=1, re-upsert
    k=3 -> THREE (last wins); log also carries an UNCOMMITTED block
    at 004 (must stay invisible)."""
    table = str(tmp_path / "mor")
    HU.init_table(table, table_type="MERGE_ON_READ",
                  recordkey_fields="k")
    _write_base(spark, table, f"p/{HU.base_file_name('g0', '001')}",
                [(1, "one"), (2, "two")])
    HU.commit_instant(table, "001", {
        "p": [{"fileId": "g0",
               "path": f"p/{HU.base_file_name('g0', '001')}"}]})
    rel = f"p/{M.log_file_name('g0', '001')}"
    M.append_log_blocks(table, rel, [
        M.data_block("002", AVSCHEMA, [
            {"k": 2, "v": "TWO"}, {"k": 3, "v": "three"}]),
        M.data_block("003", AVSCHEMA, [
            {"k": 1, "v": None, "_hoodie_is_deleted": True},
            {"k": 3, "v": "THREE"}]),
        M.data_block("004", AVSCHEMA, [{"k": 9, "v": "GHOST"}]),
    ])
    HU.commit_instant(table, "002", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    HU.commit_instant(table, "003", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    return table


def test_snapshot_merges_base_and_logs(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (2, "TWO"), (3, "THREE")]


def test_as_of_prefixes_the_timeline(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    assert _collect(M.read_hudi_mor(spark, table, DDL,
                                    as_of="002")) == [
        (1, "one"), (2, "TWO"), (3, "three")]
    assert _collect(M.read_hudi_mor(spark, table, DDL,
                                    as_of="001")) == [
        (1, "one"), (2, "two")]


def test_rollback_command_block_invalidates(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    # 005 commits, then a rollback command invalidates its block —
    # both the command path and the completed-set path are exercised
    rel = f"p/{M.log_file_name('g0', '001', version=2)}"
    M.append_log_blocks(table, rel, [
        M.data_block("005", AVSCHEMA, [{"k": 2, "v": "BAD"}]),
        M.rollback_block("006", "005"),
    ])
    HU.commit_instant(table, "005", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (2, "TWO"), (3, "THREE")]


def test_torn_tail_keeps_complete_blocks(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    rel = f"p/{M.log_file_name('g0', '001', version=3)}"
    good = M.data_block("005", AVSCHEMA, [{"k": 5, "v": "five"}])
    torn = M.data_block("005", AVSCHEMA,
                        [{"k": 6, "v": "six"}])[:-9]
    M.append_log_blocks(table, rel, [good, torn])
    HU.commit_instant(table, "005", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (2, "TWO"), (3, "THREE"), (5, "five")]


def test_compaction_supersedes_logs(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    # 005 compaction: fresh base holds the merged state; the 001-era
    # log (instants 002/003) must no longer apply
    new_base = f"p/{HU.base_file_name('g0', '005')}"
    _write_base(spark, table, new_base, [(2, "TWO"), (3, "THREE")])
    HU.commit_instant(table, "005", {
        "p": [{"fileId": "g0", "path": new_base}]})
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (2, "TWO"), (3, "THREE")]
    # a post-compaction deltacommit applies on the new base
    rel = f"p/{M.log_file_name('g0', '005')}"
    M.append_log_blocks(table, rel, [
        M.data_block("006", AVSCHEMA, [{"k": 7, "v": "seven"}])])
    HU.commit_instant(table, "006", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (2, "TWO"), (3, "THREE"), (7, "seven")]


def test_insert_only_group_without_base(spark, tmp_path):
    table = str(tmp_path / "nobase")
    HU.init_table(table, table_type="MERGE_ON_READ",
                  recordkey_fields="k")
    rel = f"p/{M.log_file_name('g1', '001')}"
    M.append_log_blocks(table, rel, [
        M.data_block("001", AVSCHEMA, [{"k": 10, "v": "ten"}])])
    HU.commit_instant(table, "001", {"p": [{"fileId": "g1",
                                            "path": rel}]},
                      action="deltacommit")
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (10, "ten")]


def test_unsupported_block_types_refuse(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    rel = f"p/{M.log_file_name('g0', '001', version=4)}"
    delete_block = M.write_block(
        M.DELETE_BLOCK, {M.INSTANT_TIME: "005"}, b"\x00" * 8)
    M.append_log_blocks(table, rel, [delete_block])
    HU.commit_instant(table, "005", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    with pytest.raises(Exception, match="block type"):
        M.read_hudi_mor(spark, table, DDL).collect()


def test_block_walk_and_refusals_unit():
    b1 = M.data_block("001", AVSCHEMA, [{"k": 1, "v": "x"}])
    b2 = M.rollback_block("002", "001")
    blocks = list(M.walk_log_blocks(b1 + b2))
    assert [t for t, _h, _c in blocks] == [M.AVRO_DATA_BLOCK,
                                           M.COMMAND_BLOCK]
    assert blocks[0][1][M.INSTANT_TIME] == "001"
    recs = M.decode_avro_block(blocks[0][2], AVSCHEMA)
    assert recs == [{"k": 1, "v": "x", "_hoodie_is_deleted": None}]
    # torn tail: stops, keeps the complete prefix
    assert len(list(M.walk_log_blocks(b1 + b2[:-3]))) == 1
    # flipped reverse pointer: treated as torn
    bad = bytearray(b1)
    bad[-1] ^= 0xFF
    assert list(M.walk_log_blocks(bytes(bad))) == []
    # bad magic mid-stream stops
    assert len(list(M.walk_log_blocks(b1 + b"JUNK" + b2))) == 1
    # data block with trailing garbage refuses
    with pytest.raises(ValueError, match="trailing"):
        M.decode_avro_block(
            M.avro_block_content(
                [AV.encode_datum(AVSCHEMA, {"k": 1})]) + b"x",
            AVSCHEMA)
    # implausible record count refuses
    with pytest.raises(ValueError, match="record count"):
        M.decode_avro_block(struct.pack(">ii", 1, -5), AVSCHEMA)


def test_cow_table_routes_to_cow_reader(spark, tmp_path):
    table = str(tmp_path / "cow")
    HU.init_table(table)  # COPY_ON_WRITE
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        M.read_hudi_mor(spark, table, DDL)
    # and the CoW reader still refuses MOR tables
    table2 = str(tmp_path / "mor2")
    HU.init_table(table2, table_type="MERGE_ON_READ",
                  recordkey_fields="k")
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        HU.resolve_files(table2)


def test_compact_folds_logs_into_new_base(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    want = _collect(M.read_hudi_mor(spark, table, DDL))
    stats = M.compact(spark, table, DDL, "007")
    # the snapshot read is unchanged...
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == want
    # ...but now resolves to a bare base file with no applicable logs
    slices, _c = M.resolve_slices(table)
    (g0,) = [s for s in slices if s[0] == "g0"]
    assert g0[1] is not None and g0[1].endswith("_007.parquet")
    assert g0[2] == []  # the 001-era log no longer applies
    # deletes MATERIALIZED: the new base physically lacks key 1
    raw = spark.read.parquet(g0[1])
    assert sorted(r.k for r in raw.collect()) == [2, 3]
    assert stats["p"][0]["fileId"] == "g0"
    # a post-compaction deltacommit lands on the new base
    rel = f"p/{M.log_file_name('g0', '007')}"
    M.append_log_blocks(table, rel, [
        M.data_block("008", AVSCHEMA, [{"k": 8, "v": "eight"}])])
    HU.commit_instant(table, "008", {"p": [{"fileId": "g0",
                                            "path": rel}]},
                      action="deltacommit")
    assert _collect(M.read_hudi_mor(spark, table, DDL)) == [
        (2, "TWO"), (3, "THREE"), (8, "eight")]
    # nothing left to compact raises rather than committing a no-op
    M.compact(spark, table, DDL, "009")
    with pytest.raises(ValueError, match="nothing to compact"):
        M.compact(spark, table, DDL, "010")


def test_cli_hudi_mor_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    table = _mor_table(spark, tmp_path)
    rc = main(["hudi-mor-scan", table, "--ddl", DDL], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "THREE" in out and "GHOST" not in out


def test_missing_recordkey_refuses(spark, tmp_path):
    table = str(tmp_path / "nokey")
    HU.init_table(table, table_type="MERGE_ON_READ")
    with pytest.raises(ValueError, match="recordkey"):
        M.read_hudi_mor(spark, table, DDL)
