"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a count() (no driver-side collect of result
data; the work happens on executors). A warmup pass on the smallest SF
absorbs JVM/codegen startup so numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_computing_projects_spark.queries import load_registry
from distributed_computing_projects_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = load_registry()
    headliners = {n: s for n, s in registry.items() if s.headline}

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches on the tiny SF.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for spec in headliners.values():
            try:
                spec.fn(spark, warm_dir).count()
            except Exception:
                pass

    timings: dict[str, float] = {}
    for name, spec in sorted(headliners.items()):
        # best of 5 (was 3 through r4): the first run absorbs one-off
        # codegen/JIT compile of this plan shape, and repeats are still
        # exposed to transient host contention — r5 observed identical
        # code swinging 1.7x run-to-run and single queries 4x on the
        # shared box, so two more samples buy a materially stabler
        # minimum. Min-of-5 <= min-of-3, so cross-round comparisons
        # should lean on the per-query values, not the protocol delta.
        best = float("inf")
        for _ in range(5):
            # fairness: operators may persist() intermediates; clearing
            # between runs means the repeat measures real recompute,
            # not a cache read
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
