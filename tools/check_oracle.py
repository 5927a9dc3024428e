"""Local differential harness — thin wrapper over
``distributed_computing_projects_spark.verify`` (the logic moved
in-package so `python -m distributed_computing_projects_spark verify`
shares it; this entry point stays for muscle memory).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_projects_spark import verify
from distributed_computing_projects_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    failed = verify.run(spark, sf_dir, only)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
