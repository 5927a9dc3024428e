"""Columnar sink roundtrips: ORC and zstd-parquet scratch stores
(queries/ext_pipeline.py) — codec honesty (the footer must say ZSTD,
never a silent snappy fallback), fact parity between the formats, and
the stale-scratch reaper's age guard."""

from __future__ import annotations

import glob
import os
import time

from distributed_computing_projects_spark.queries import load_registry

SF_DIR = "/root/testdata/sf0.001"


def test_zstd_parquet_roundtrip_codec_and_parity(spark):
    reg = load_registry()
    zstd_rows = sorted(
        tuple(r) for r in
        reg["parquet_zstd_roundtrip"].fn(spark, SF_DIR).collect())
    orc_rows = sorted(
        tuple(r) for r in
        reg["orc_events_roundtrip"].fn(spark, SF_DIR).collect())
    assert zstd_rows == orc_rows and zstd_rows  # lossless across codecs

    import pyarrow.parquet as pq
    import tempfile

    app = spark.sparkContext.applicationId
    store = os.path.join(
        tempfile.gettempdir(), f"dcp_pq_zstd_events_sf0.001_{app}")
    files = glob.glob(os.path.join(store, "**", "*.parquet"),
                      recursive=True)
    assert files, "scratch store should exist for this session"
    for f in files:
        md = pq.ParquetFile(f).metadata
        assert md.row_group(0).column(0).compression == "ZSTD", f


def test_scratch_reaper_age_guard(spark, tmp_path):
    import tempfile

    from distributed_computing_projects_spark.queries.ext_pipeline import (
        _session_scratch,
    )

    tmp = tempfile.gettempdir()
    stale = os.path.join(tmp, "dcp_reaptest_sf0.001_app-stale")
    fresh = os.path.join(tmp, "dcp_reaptest_sf0.001_app-fresh")
    for p in (stale, fresh):
        os.makedirs(p, exist_ok=True)
    os.utime(stale, (time.time() - 7200,) * 2)
    path = _session_scratch(spark, "reaptest", SF_DIR)
    try:
        assert not os.path.exists(stale)  # older than the guard: reaped
        assert os.path.exists(fresh)      # younger: kept (maybe live)
        assert path.endswith(spark.sparkContext.applicationId)
    finally:
        import shutil

        for p in (stale, fresh, path):
            shutil.rmtree(p, ignore_errors=True)
