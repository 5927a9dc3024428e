"""Delta Lake reader (sources/deltalake.py): log replay vs the
protocol — tombstones, orphans, checkpoints, time travel, partition
values from the log, loud refusal of unsupported features."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from distributed_computing_projects_spark.sources import deltalake as DL


SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", StringType()),
])
PART_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("x", DoubleType()),
    StructField("bucket", LongType()),   # partition column
])


def _write_file(spark, table, rel, rows, schema):
    """One parquet data file at table/rel with exactly `rows`."""
    stage = os.path.join(table, f".stage-{rel.replace('/', '_')}")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    part = next(n for n in sorted(os.listdir(stage))
                if n.startswith("part-") and n.endswith(".parquet"))
    dest = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)
    shutil.rmtree(stage, ignore_errors=True)
    return os.path.getsize(dest)


def _basic_table(spark, tmp_path):
    """v0: a.parquet + b.parquet; v1: remove b (file STAYS on disk),
    add c; an orphan parquet never committed sits alongside."""
    table = str(tmp_path / "t")
    os.makedirs(table)
    data_schema = StructType(SCHEMA.fields)
    sa = _write_file(spark, table, "a.parquet",
                     [(1, "one"), (2, "two")], data_schema)
    sb = _write_file(spark, table, "b.parquet",
                     [(3, "three")], data_schema)
    _write_file(spark, table, "orphan.parquet",
                [(99, "poison")], data_schema)
    DL.commit_json(table, 0, [
        DL.protocol_action(),
        DL.metadata_action(SCHEMA, []),
        DL.add_action("a.parquet", {}, sa),
        DL.add_action("b.parquet", {}, sb),
    ])
    sc = _write_file(spark, table, "c.parquet",
                     [(4, "four")], data_schema)
    DL.commit_json(table, 1, [
        DL.remove_action("b.parquet"),
        DL.add_action("c.parquet", {}, sc),
    ])
    return table


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_tombstones_and_orphans_excluded(spark, tmp_path):
    table = _basic_table(spark, tmp_path)
    assert os.path.exists(os.path.join(table, "b.parquet"))
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, "one"), (2, "two"), (4, "four")]


def test_time_travel(spark, tmp_path):
    table = _basic_table(spark, tmp_path)
    v0 = _collect(DL.read_delta(spark, table, version=0))
    assert v0 == [(1, "one"), (2, "two"), (3, "three")]
    with pytest.raises(ValueError, match="not in log"):
        DL.read_delta(spark, table, version=7)


def test_partition_values_ride_the_log(spark, tmp_path):
    """Data files lack the partition column entirely; values come
    from add.partitionValues, cast to the schema type."""
    table = str(tmp_path / "p")
    os.makedirs(table)
    data_schema = StructType(PART_SCHEMA.fields[:2])
    acts = [DL.protocol_action(),
            DL.metadata_action(PART_SCHEMA, ["bucket"])]
    for b in (0, 1, 2):
        rel = f"bucket={b}/f{b}.parquet"
        size = _write_file(spark, table, rel,
                           [(10 * b + i, float(i)) for i in range(3)],
                           data_schema)
        acts.append(DL.add_action(rel, {"bucket": str(b)}, size))
    DL.commit_json(table, 0, acts)
    df = DL.read_delta(spark, table)
    assert [f.name for f in df.schema.fields] == ["k", "x", "bucket"]
    assert df.schema["bucket"].dataType.simpleString() == "bigint"
    got = _collect(df)
    assert got == sorted((10 * b + i, float(i), b)
                         for b in (0, 1, 2) for i in range(3))
    pruned = DL.read_delta(spark, table, partitions={"bucket": 1})
    assert _collect(pruned) == [(10 + i, float(i), 1)
                                for i in range(3)]
    with pytest.raises(ValueError, match="non-partition"):
        DL.read_delta(spark, table, partitions={"k": 1})


def test_checkpoint_seeds_replay_after_log_cleanup(spark, tmp_path):
    table = _basic_table(spark, tmp_path)
    DL.write_checkpoint(spark, table, 1)
    data_schema = StructType(SCHEMA.fields)
    sd = _write_file(spark, table, "d.parquet",
                     [(5, "five")], data_schema)
    DL.commit_json(table, 2, [DL.remove_action("a.parquet"),
                              DL.add_action("d.parquet", {}, sd)])
    # retention cleanup deletes the pre-checkpoint commits
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log",
                               f"{v:020d}.json"))
    got = _collect(DL.read_delta(spark, table))
    assert got == [(4, "four"), (5, "five")]
    # the checkpoint itself is a valid time-travel target
    assert _collect(DL.read_delta(spark, table, version=1)) == \
        [(1, "one"), (2, "two"), (4, "four")]
    # r17 (r16 ADVICE): checkpoint-derived MAP columns come back as
    # dicts EVEN WHEN EMPTY — the former pair-list normalization left
    # empty maps as [] (so a .items()/.get() on snap.meta fields
    # would raise only on the checkpoint path). Assert at the seam:
    ckpt = os.path.join(table, "_delta_log",
                        f"{1:020d}.checkpoint.parquet")
    saw_map = False
    for row in DL._read_checkpoint_rows([ckpt]):
        add = row.get("add")
        if add is not None:
            assert isinstance(add["partitionValues"], dict)  # {} not []
            saw_map = True
        md = row.get("metaData")
        if md is not None:
            assert isinstance(md["configuration"], dict)
            assert isinstance(md["format"]["options"], dict)
    assert saw_map


def test_schema_evolution_nulls_old_files(spark, tmp_path):
    table = str(tmp_path / "e")
    os.makedirs(table)
    old_schema = StructType(SCHEMA.fields)
    sa = _write_file(spark, table, "old.parquet",
                     [(1, "one")], old_schema)
    DL.commit_json(table, 0, [DL.protocol_action(),
                              DL.metadata_action(SCHEMA, []),
                              DL.add_action("old.parquet", {}, sa)])
    wide = StructType(SCHEMA.fields
                      + [StructField("extra", LongType())])
    sb = _write_file(spark, table, "new.parquet",
                     [(2, "two", 22)], wide)
    DL.commit_json(table, 1, [DL.metadata_action(wide, []),
                              DL.add_action("new.parquet", {}, sb)])
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, "one", None), (2, "two", 22)]


def test_url_encoded_paths(spark, tmp_path):
    table = str(tmp_path / "u")
    os.makedirs(table)
    data_schema = StructType(SCHEMA.fields)
    size = _write_file(spark, table, "dir with space/f 1.parquet",
                       [(1, "one")], data_schema)
    act = DL.add_action("dir with space/f 1.parquet", {}, size)
    assert "%20" in act["add"]["path"]  # spec: paths percent-encode
    DL.commit_json(table, 0, [DL.protocol_action(),
                              DL.metadata_action(SCHEMA, []), act])
    assert _collect(DL.read_delta(spark, table)) == [(1, "one")]


def test_unsupported_features_refuse_loudly(spark, tmp_path):
    table = str(tmp_path / "bad")
    os.makedirs(table)
    DL.commit_json(table, 0, [
        {"protocol": {"minReaderVersion": 4, "minWriterVersion": 5}},
        DL.metadata_action(SCHEMA, []),
    ])
    with pytest.raises(ValueError, match="minReaderVersion"):
        DL.read_delta(spark, table)

    # name mode reads (test_column_mapping_*); id mode still refuses
    table2 = str(tmp_path / "bad2")
    os.makedirs(table2)
    meta = DL.metadata_action(SCHEMA, [])
    meta["metaData"]["configuration"] = {
        "delta.columnMapping.mode": "id"}
    DL.commit_json(table2, 0, [DL.protocol_action(), meta])
    with pytest.raises(ValueError, match="column mapping"):
        DL.read_delta(spark, table2)

    # deletion vectors are now READ (tests/test_deltadv.py); an
    # unknown DV storage type still refuses at scan time
    table3 = str(tmp_path / "bad3")
    os.makedirs(table3)
    data3 = StructType(SCHEMA.fields)
    size3 = _write_file(spark, table3, "x.parquet", [(1, "one")],
                        data3)
    add = DL.add_action("x.parquet", {}, size3)
    add["add"]["deletionVector"] = {
        "storageType": "z", "pathOrInlineDv": "?", "sizeInBytes": 1,
        "cardinality": 1}
    DL.commit_json(table3, 0, [DL.protocol_action(),
                               DL.metadata_action(SCHEMA, []), add])
    with pytest.raises(ValueError, match="storageType"):
        DL.read_delta(spark, table3)

    # reader version 3 with only supported features is fine
    table4 = str(tmp_path / "ok3")
    os.makedirs(table4)
    data_schema = StructType(SCHEMA.fields)
    size = _write_file(spark, table4, "a.parquet", [(1, "one")],
                       data_schema)
    DL.commit_json(table4, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["timestampNtz"],
                      "writerFeatures": []}},
        DL.metadata_action(SCHEMA, []),
        DL.add_action("a.parquet", {}, size),
    ])
    assert _collect(DL.read_delta(spark, table4)) == [(1, "one")]


def _cm_meta(logical_val):
    """name-mode metaData whose value column's LOGICAL name varies
    across history while the physical name stays col-bbb."""
    fields = [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName":
                          "col-aaa"}},
        {"name": logical_val, "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName":
                          "col-bbb"}},
        {"name": "b", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName":
                          "col-ccc"}},
    ]
    return {"metaData": {
        "id": "0" * 32,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct",
                                    "fields": fields}),
        "partitionColumns": ["col-ccc"],  # physical-keyed writer
        "configuration": {"delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "3"},
        "createdTime": 0}}


def test_column_mapping_name_mode(spark, tmp_path):
    from pyspark.sql.types import StructType as ST

    table = str(tmp_path / "cm")
    os.makedirs(table)
    phys_schema = ST([
        StructField("col-aaa", LongType()),
        StructField("col-bbb", StringType()),
    ])
    s1 = _write_file(spark, table, "p=x/f1.parquet",
                     [(1, "one"), (2, "two")], phys_schema)
    s2 = _write_file(spark, table, "p=y/f2.parquet",
                     [(3, "three")], phys_schema)
    DL.commit_json(table, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _cm_meta("val"),
        DL.add_action("p=x/f1.parquet", {"col-ccc": "x"}, s1),
    ])
    # v1 RENAMES logical val -> value (physical name unchanged: the
    # whole point of name mode) and adds a second partition
    DL.commit_json(table, 1, [
        _cm_meta("value"),
        DL.add_action("p=y/f2.parquet", {"col-ccc": "y"}, s2),
    ])
    df = DL.read_delta(spark, table)
    assert df.columns == ["k", "value", "b"]
    assert _collect(df) == [(1, "one", "x"), (2, "two", "x"),
                            (3, "three", "y")]
    # time travel to v0 sees the OLD logical name, same bytes
    df0 = DL.read_delta(spark, table, version=0)
    assert df0.columns == ["k", "val", "b"]
    assert _collect(df0) == [(1, "one", "x"), (2, "two", "x")]
    # partition pruning by LOGICAL column name
    assert _collect(DL.read_delta(spark, table,
                                  partitions={"b": "y"})) == [
        (3, "three", "y")]


def test_column_mapping_nested_rename_refuses(spark, tmp_path):
    table = str(tmp_path / "cmn")
    os.makedirs(table)
    fields = [
        {"name": "s", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "s"},
         "type": {"type": "struct", "fields": [
             {"name": "a", "type": "long", "nullable": True,
              "metadata": {"delta.columnMapping.physicalName":
                           "col-zzz"}}]}},
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
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta])
    with pytest.raises(ValueError, match="NESTED"):
        DL.read_delta(spark, table)


def test_column_mapping_physical_collision_refuses(spark, tmp_path):
    table = str(tmp_path / "cmc")
    os.makedirs(table)
    fields = [
        {"name": "a", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-x"}},
        {"name": "b", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-x"}},
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
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta])
    with pytest.raises(ValueError, match="collide"):
        DL.read_delta(spark, table)


def test_log_gap_raises_for_explicit_version(spark, tmp_path):
    table = _basic_table(spark, tmp_path)
    data_schema = StructType(SCHEMA.fields)
    sd = _write_file(spark, table, "d.parquet", [(5, "five")],
                     data_schema)
    DL.commit_json(table, 3, [DL.add_action("d.parquet", {}, sd)])
    # latest (None) stops at the last CONTIGUOUS version: 1
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, "one"), (2, "two"), (4, "four")]
    with pytest.raises(ValueError, match="gap"):
        DL.read_delta(spark, table, version=3)


def test_empty_table_after_full_delete(spark, tmp_path):
    table = _basic_table(spark, tmp_path)
    DL.commit_json(table, 2, [DL.remove_action("a.parquet"),
                              DL.remove_action("c.parquet")])
    df = DL.read_delta(spark, table)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_basename_collision_falls_back_to_groups(spark, tmp_path):
    """Two adds sharing a basename in different partition dirs: the
    broadcast-on-basename fast path must be REJECTED and the
    per-group union fallback produce the same correct answer."""
    table = str(tmp_path / "c")
    os.makedirs(table)
    data_schema = StructType(PART_SCHEMA.fields[:2])
    acts = [DL.protocol_action(),
            DL.metadata_action(PART_SCHEMA, ["bucket"])]
    for b in (0, 1):
        rel = f"bucket={b}/data.parquet"   # same basename
        size = _write_file(spark, table, rel,
                           [(b, float(b))], data_schema)
        acts.append(DL.add_action(rel, {"bucket": str(b)}, size))
    DL.commit_json(table, 0, acts)
    got = _collect(DL.read_delta(spark, table))
    assert got == [(0, 0.0, 0), (1, 1.0, 1)]


def test_null_partition_value(spark, tmp_path):
    table = str(tmp_path / "n")
    os.makedirs(table)
    data_schema = StructType(PART_SCHEMA.fields[:2])
    size = _write_file(spark, table, "f.parquet", [(1, 1.0)],
                       data_schema)
    act = DL.add_action("f.parquet", {}, size)
    act["add"]["partitionValues"] = {"bucket": None}
    DL.commit_json(table, 0, [
        DL.protocol_action(),
        DL.metadata_action(PART_SCHEMA, ["bucket"]), act])
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, 1.0, None)]
    pruned = DL.read_delta(spark, table,
                           partitions={"bucket": None})
    assert _collect(pruned) == [(1, 1.0, None)]


def test_last_checkpoint_hint_is_not_trusted(spark, tmp_path):
    """A stale/corrupt _last_checkpoint must not affect the read:
    the listing is authoritative."""
    table = _basic_table(spark, tmp_path)
    hint = os.path.join(table, "_delta_log", "_last_checkpoint")
    with open(hint, "w", encoding="utf-8") as f:
        json.dump({"version": 999, "size": 1}, f)
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, "one"), (2, "two"), (4, "four")]


def test_cli_delta_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    table = _basic_table(spark, tmp_path)
    rc = main(["delta-scan", table], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "four" in out and "three" not in out
    rc = main(["delta-scan", table, "--version", "0"], spark=spark)
    assert rc == 0
    assert "three" in capsys.readouterr().out


def test_write_delta_sink_roundtrip(spark, tmp_path):
    table = str(tmp_path / "sink")
    df1 = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, None)],
        "k bigint, x double, bucket string")
    v = DL.write_delta(df1, table, partition_by=["bucket"])
    assert v == 0
    df2 = spark.createDataFrame([(4, 4.0, "a")],
                                "k bigint, x double, bucket string")
    assert DL.write_delta(df2, table, partition_by=["bucket"]) == 1
    got = _collect(DL.read_delta(spark, table))
    assert got == [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, None),
                   (4, 4.0, "a")]
    # partition values ride the log, not the data files
    snap = DL.resolve_snapshot(spark, table)
    assert snap.partition_columns == ["bucket"]
    assert all("bucket" in pv for _p, pv in snap.files)
    # version 0 is still readable: time travel over sink commits
    assert len(_collect(DL.read_delta(spark, table, version=0))) == 3


def test_write_delta_overwrite_and_schema_gate(spark, tmp_path):
    table = str(tmp_path / "ow")
    df1 = spark.createDataFrame([(1, "one")], "k bigint, v string")
    DL.write_delta(df1, table)
    df2 = spark.createDataFrame([(9, "nine")], "k bigint, v string")
    DL.write_delta(df2, table, mode="overwrite")
    assert _collect(DL.read_delta(spark, table)) == [(9, "nine")]
    assert _collect(DL.read_delta(spark, table, version=0)) == \
        [(1, "one")]
    bad = spark.createDataFrame([(1.5, "x")], "k double, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        DL.write_delta(bad, table)
    with pytest.raises(ValueError, match="partitioning mismatch"):
        DL.write_delta(df2, table, partition_by=["v"])
