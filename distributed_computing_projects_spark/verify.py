"""In-package differential verification harness: run registered
queries on Spark AND their oracle SQL on DuckDB over the same parquet,
compare row counts, column sets, and exact values — the same contract
as the driver's CORRECTNESS gate (which hash-compares values after
sorting columns by name), available as one command so a red rotation
row is caught the session it is introduced, not a round later.

Entry points: ``python -m distributed_computing_projects_spark verify
[names...]`` (cli.py) and ``python tools/check_oracle.py`` (thin
wrapper, kept for muscle memory).
"""

from __future__ import annotations

import math

import pandas as pd

from distributed_computing_projects_spark.queries import load_registry
from distributed_computing_projects_spark.sources.registry import TABLE_NAMES


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        # unify timestamp flavors
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame,
            duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)}"
            f" duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(
            f"row count differs: spark={len(spark_df)} duck={len(duck_df)}"
        )
    a, b = normalize(spark_df), normalize(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            # The driver's hash gate is dtype-sensitive: DuckDB sum(int)
            # yields HUGEINT (-> float64/object via pandas) while Spark
            # yields int64. Flag the kind mismatch instead of silently
            # coercing both sides to float and reporting OK.
            if av.dtype.kind != bv.dtype.kind and \
                    {av.dtype.kind, bv.dtype.kind} & {"i", "u"}:
                problems.append(
                    f"dtype kind differs in col {c!r}: spark={av.dtype}"
                    f" duck={bv.dtype}"
                    " (driver hash gate would FAIL; cast the oracle side)"
                )
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = all(
                    (math.isnan(x) and math.isnan(y)) or x == y
                    for x, y in zip(av.astype(float), bv.astype(float))
                )
            else:
                ok = av.equals(bv) or list(av) == list(bv)
            if not ok:
                bad = [
                    (i, x, y)
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not (x == y
                            or (isinstance(x, float) and isinstance(y, float)
                                and math.isnan(x) and math.isnan(y)))
                ][:3]
                problems.append(f"values differ in col {c!r}: {bad}")
    return problems


def run(spark, sf_dir: str, only: set[str] | None = None,
        out=print) -> list[str]:
    """Verify every registered query (or the ``only`` subset) against
    its oracle at ``sf_dir``; returns the list of failed names."""
    registry = load_registry()
    if only:
        unknown = only - set(registry)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
    con = duck_con(sf_dir)
    failed = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        sdf = spec.fn(spark, sf_dir).toPandas()
        if spec.oracle is None:
            out(f"  {name:40s} rows={len(sdf):7d}  (rows-only, no oracle)")
            continue
        ddf = con.execute(spec.oracle).fetchdf()
        problems = compare(name, sdf, ddf)
        status = "OK " if not problems else "FAIL"
        out(f"  {name:40s} rows={len(sdf):7d}  {status}")
        for p in problems:
            out(f"      - {p}")
        if problems:
            failed.append(name)
    out(f"\n{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return failed
