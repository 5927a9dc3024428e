"""Action-level wall-clock profile of the heavyweight fixture-building
headline queries (the delta/hudi/iceberg/tfrecord bench floors) —
finer grain than tools/lakehouse_attribution.py: every Spark ACTION
(parquet/json write, collect, count, createDataFrame) fired while one
query runs is timed and attributed to its caller line, so the
optimization rounds can see WHICH step of a 10 s fixture floor is
worth attacking.

Usage: python tools/profile_fixture_stages.py [sf_dir] [query ...]
  (default queries: the six fixture-floor headliners)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_computing_projects_spark.session import get_spark  # noqa: E402

EVENTS: list[tuple[str, str, float]] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "distributed_computing_projects_spark" in fn or \
                fn.endswith("ext_pipeline.py"):
            return f"{os.path.basename(fn)}:{fr.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        site = _caller()
        t0 = time.monotonic()
        try:
            return orig(self, *a, **kw)
        finally:
            EVENTS.append((name, site, time.monotonic() - t0))

    setattr(cls, name, timed)


def main() -> int:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    queries = sys.argv[2:] or [
        "delta_table_scan", "delta_dv_table_scan",
        "iceberg_pos_delete_scan", "hudi_table_scan",
        "hudi_mor_snapshot_scan", "tfrecord_scan",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="fixture-profile", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("parquet", "json", "save", "text"):
        _wrap(DataFrameWriter, m)
    for m in ("collect", "count"):
        _wrap(DataFrame, m)
    _wrap(SparkSession, "createDataFrame")

    from distributed_computing_projects_spark.queries import (
        load_registry,
    )

    reg = load_registry()
    for qname in queries:
        for attempt in ("cold", "warm"):
            EVENTS.clear()
            t0 = time.monotonic()
            reg[qname].fn(spark, sf_dir).count()
            total = time.monotonic() - t0
            traced = sum(d for _n, _w, d in EVENTS)
            print(f"--- {qname} [{attempt}]: total {total:.2f}s "
                  f"(traced actions {traced:.2f}s, "
                  f"untraced {total - traced:.2f}s)")
            for n, where, d in EVENTS:
                if d >= 0.02:
                    print(f"    {d:7.3f}s  {n:<16} {where}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
