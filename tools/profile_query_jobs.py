"""Per-query Spark JOB attribution for the optimization rounds: run
one headline query exactly the way the bench does (same session
factory, same count() action, clearCache between reps) and report,
per rep, wall-clock plus the NUMBER OF SPARK JOBS the rep fired and
each job's duration — the quantity round-17's dedup/pagerank work
items are measured by ("fewer Spark jobs per round").

Job counting uses the status tracker + setJobGroup, so jobs fired by
fixture builders, persists, convergence counts and the final count
are all attributed to the query that fired them.

Usage: python tools/profile_query_jobs.py <query> [query ...]
         [--reps N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_computing_projects_spark.queries import load_registry  # noqa: E402
from distributed_computing_projects_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_jobs", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in args.queries:
        spec = registry[name]
        # warmup on the smallest SF (codegen/JVM), like the bench
        warm = "/root/testdata/sf0.001"
        if os.path.isdir(warm):
            try:
                spec.fn(spark, warm).count()
            except Exception:
                pass
        for rep in range(args.reps):
            spark.catalog.clearCache()
            group = f"{name}-rep{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).count()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            job_ids = sorted(tracker.getJobIdsForGroup(group))
            jobs = []
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                sids = ji.stageIds if ji else []
                stage_time = 0.0
                n_tasks = 0
                for sid in sids:
                    si = tracker.getStageInfo(sid)
                    if si:
                        n_tasks += si.numTasks
                jobs.append((jid, len(sids), n_tasks))
            print(f"{name} rep{rep}: {dt:.3f}s  jobs={len(job_ids)}  "
                  + " ".join(f"[j{j} st={s} tasks={t}]"
                             for j, s, t in jobs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
