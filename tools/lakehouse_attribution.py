"""Cost attribution for the lakehouse headline BENCH rows
(`delta_table_scan`, `delta_dv_table_scan`, `hudi_table_scan`) — the
avro/tfrecord/xlsx stage-decomposition discipline applied to the rows
whose bench totals are dominated by fixture construction.

Each lakehouse round-trip query pays three very different stages:

  1. fixture_build  — staging the table itself: Spark writes the
                      partitioned data files, moves them into the
                      table layout, writes commits/checkpoints or
                      timeline instants (fixture-only; a REAL table's
                      writer already paid this)
  2. log_replay     — the driver-side metadata resolution a reader
                      DOES pay: Delta log replay (checkpoint seed +
                      JSON commits + DV descriptor decode) or Hudi
                      timeline replay; KB-sized however large the
                      table
  3. scan           — the one native parquet FileScan over the
                      resolved file list + broadcast attach/anti-join
                      + a count-style fold (what a user's query pays
                      beyond their own aggregation)

Usage: python tools/lakehouse_attribution.py [sf_dir]
  (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1 — the bench
  scale, so the split maps 1:1 onto BENCH_r{N}.json entries)
Prints one JSON line; prose lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_computing_projects_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="lakehouse-attribution", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from distributed_computing_projects_spark.queries.ext_pipeline import (
        _HUDI_DDL,
        _HUDI_MOR_DDL,
        _build_delta_dv_landing,
        _build_delta_landing,
        _build_hudi_landing,
        _build_hudi_mor_landing,
        _build_iceberg_posdel_landing,
    )
    from distributed_computing_projects_spark.sources import (
        deltalake as DL,
    )
    from distributed_computing_projects_spark.sources import hudi as HU
    from distributed_computing_projects_spark.sources import (
        hudimor as HM,
    )
    from distributed_computing_projects_spark.sources import (
        iceberg as IC,
    )

    out = {"sf_dir": sf_dir, "cpus": cpus}

    def split(tag, build, replay, scan):
        t0 = time.monotonic()
        table = build()
        t1 = time.monotonic()
        n_files = replay(table)
        t2 = time.monotonic()
        n_rows = scan(table)
        t3 = time.monotonic()
        out[tag] = {
            "fixture_build_s": round(t1 - t0, 3),
            "log_replay_s": round(t2 - t1, 3),
            "scan_s": round(t3 - t2, 3),
            "active_files": n_files, "rows": n_rows,
        }

    split(
        "delta_table_scan",
        lambda: _build_delta_landing(spark, sf_dir,
                                     "attr_delta")[1],
        lambda t: len(DL.resolve_snapshot(spark, t).files),
        lambda t: DL.read_delta(spark, t).count(),
    )
    split(
        "delta_dv_table_scan",
        lambda: _build_delta_dv_landing(spark, sf_dir,
                                        "attr_delta_dv")[1],
        lambda t: len(DL.resolve_snapshot(spark, t).files),
        lambda t: DL.read_delta(spark, t).count(),
    )
    split(
        "hudi_table_scan",
        lambda: _build_hudi_landing(spark, sf_dir, "attr_hudi")[1],
        lambda t: len(HU.resolve_files(t)),
        lambda t: HU.read_hudi(spark, t, _HUDI_DDL).count(),
    )
    split(
        "iceberg_pos_delete_scan",
        lambda: _build_iceberg_posdel_landing(spark, sf_dir,
                                              "attr_ice_pd")[1],
        lambda t: len(IC.resolve_snapshot(t).files),
        lambda t: IC.read_iceberg(spark, t).count(),
    )
    split(
        "hudi_mor_snapshot_scan",
        lambda: _build_hudi_mor_landing(spark, sf_dir,
                                        "attr_mor")[1],
        lambda t: len(HM.resolve_slices(t)[0]),
        lambda t: HM.read_hudi_mor(spark, t, _HUDI_MOR_DDL).count(),
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
