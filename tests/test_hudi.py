"""Hudi CoW reader (sources/hudi.py): timeline replay, latest file
slice per group, replacecommits, inflight invisibility, as_of."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from distributed_computing_projects_spark.sources import hudi as HU


SCHEMA = StructType([StructField("k", LongType()),
                     StructField("v", StringType())])
DDL = "k bigint, v string"


def _write_parquet(spark, dest, rows):
    stage = dest + ".stage"
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    part = next(n for n in sorted(os.listdir(stage))
                if n.startswith("part-") and n.endswith(".parquet"))
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)
    shutil.rmtree(stage, ignore_errors=True)


def _stat(fid, rel):
    return {"fileId": fid, "path": rel, "numWrites": 1}


def _make_table(spark, tmp_path):
    """t1: groups g1(p=a), g2(p=b); t2: g1 REWRITTEN (update — the
    t1 version of g1 stays on disk), g3 added; t3: replacecommit
    removes g2 (clustering it into g4)."""
    table = str(tmp_path / "h")
    HU.init_table(table)
    f1a = f"p=a/{HU.base_file_name('g1', '001')}"
    f2 = f"p=b/{HU.base_file_name('g2', '001')}"
    f1b = f"p=a/{HU.base_file_name('g1', '002')}"
    f3 = f"p=b/{HU.base_file_name('g3', '002')}"
    f4 = f"p=b/{HU.base_file_name('g4', '003')}"
    _write_parquet(spark, os.path.join(table, f1a),
                   [(1, "one-v1")])
    _write_parquet(spark, os.path.join(table, f2), [(2, "two")])
    HU.commit_instant(table, "001",
                      {"p=a": [_stat("g1", f1a)],
                       "p=b": [_stat("g2", f2)]})
    _write_parquet(spark, os.path.join(table, f1b),
                   [(1, "one-v2")])
    _write_parquet(spark, os.path.join(table, f3), [(3, "three")])
    HU.commit_instant(table, "002",
                      {"p=a": [_stat("g1", f1b)],
                       "p=b": [_stat("g3", f3)]})
    _write_parquet(spark, os.path.join(table, f4),
                   [(2, "two-clustered")])
    HU.commit_instant(table, "003", {"p=b": [_stat("g4", f4)]},
                      replace_file_ids={"p=b": ["g2"]})
    return table


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_latest_file_slices(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    # the superseded g1 v1 file is still on disk
    assert os.path.exists(os.path.join(
        table, f"p=a/{HU.base_file_name('g1', '001')}"))
    got = _collect(HU.read_hudi(spark, table, DDL))
    assert got == [(1, "one-v2"), (2, "two-clustered"),
                   (3, "three")]


def test_as_of_time_travel(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    assert _collect(HU.read_hudi(spark, table, DDL, as_of="001")) \
        == [(1, "one-v1"), (2, "two")]
    assert _collect(HU.read_hudi(spark, table, DDL, as_of="002")) \
        == [(1, "one-v2"), (2, "two"), (3, "three")]
    with pytest.raises(ValueError, match="no hudi instant"):
        HU.read_hudi(spark, table, DDL, as_of="000")


def test_clean_reclaims_superseded_and_torn(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    # torn litter: a data file whose instant never completed
    torn = f"p=a/{HU.base_file_name('g9', '004')}"
    _write_parquet(spark, os.path.join(table, torn),
                   [(99, "ghost")])
    plan = HU.clean(table, dry_run=True)
    assert f"p=a/{HU.base_file_name('g1', '001')}" in plan  # update
    assert f"p=b/{HU.base_file_name('g2', '001')}" in plan  # replace
    assert torn in plan
    assert os.path.exists(os.path.join(table, torn))  # dry run
    gone = HU.clean(table)
    assert gone == plan
    # the snapshot read is unchanged; timeline intact
    assert _collect(HU.read_hudi(spark, table, DDL)) == [
        (1, "one-v2"), (2, "two-clustered"), (3, "three")]
    assert HU.clean(table) == []
    # as-of to a cleaned instant fails LOUDLY (missing path), never
    # silently shrinks
    with pytest.raises(Exception):
        HU.read_hudi(spark, table, DDL, as_of="001").collect()


def test_inflight_commits_invisible(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    hoodie = os.path.join(table, ".hoodie")
    # a torn writer: requested + inflight markers, no completed file
    for state in ("requested", "inflight"):
        with open(os.path.join(hoodie, f"004.commit.{state}"), "w"):
            pass
    f5 = f"p=a/{HU.base_file_name('g1', '004')}"
    _write_parquet(spark, os.path.join(table, f5), [(1, "torn")])
    got = _collect(HU.read_hudi(spark, table, DDL))
    assert got == [(1, "one-v2"), (2, "two-clustered"),
                   (3, "three")]


def test_merge_on_read_and_1x_layout_refuse(spark, tmp_path):
    table = str(tmp_path / "mor")
    HU.init_table(table)
    props = os.path.join(table, ".hoodie", "hoodie.properties")
    text = open(props).read().replace("COPY_ON_WRITE",
                                      "MERGE_ON_READ")
    with open(props, "w") as f:
        f.write(text)
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        HU.read_hudi(spark, table, DDL)

    table2 = str(tmp_path / "v1x")
    HU.init_table(table2)
    os.makedirs(os.path.join(table2, ".hoodie", "timeline"))
    with pytest.raises(ValueError, match="timeline"):
        HU.read_hudi(spark, table2, DDL)


def test_empty_table(spark, tmp_path):
    table = str(tmp_path / "empty")
    HU.init_table(table)
    df = HU.read_hudi(spark, table, DDL)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_hoodie_meta_columns_prune_away(spark, tmp_path):
    """Real Hudi base files carry _hoodie_* meta columns; pinning
    the DDL must read the data columns and ignore them."""
    table = str(tmp_path / "meta")
    HU.init_table(table)
    wide = StructType([
        StructField("_hoodie_commit_time", StringType()),
        StructField("_hoodie_record_key", StringType()),
    ] + SCHEMA.fields)
    rel = f"p=a/{HU.base_file_name('g1', '001')}"
    stage = os.path.join(table, "stage")
    spark.createDataFrame([("001", "rk1", 1, "one")], wide) \
        .coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(n for n in sorted(os.listdir(stage))
                if n.startswith("part-") and n.endswith(".parquet"))
    os.makedirs(os.path.join(table, "p=a"), exist_ok=True)
    os.replace(os.path.join(stage, part), os.path.join(table, rel))
    shutil.rmtree(stage, ignore_errors=True)
    HU.commit_instant(table, "001", {"p=a": [_stat("g1", rel)]})
    got = _collect(HU.read_hudi(spark, table, DDL))
    assert got == [(1, "one")]


def test_malformed_commit_metadata_refuses(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    with open(os.path.join(table, ".hoodie", "004.commit"),
              "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="unreadable"):
        HU.read_hudi(spark, table, DDL)


def test_cli_hudi_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    table = _make_table(spark, tmp_path)
    rc = main(["hudi-scan", table, "--ddl", DDL], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "one-v2" in out and "one-v1" not in out
    rc = main(["hudi-scan", table, "--ddl", DDL, "--as-of", "001"],
              spark=spark)
    assert rc == 0
    assert "one-v1" in capsys.readouterr().out
