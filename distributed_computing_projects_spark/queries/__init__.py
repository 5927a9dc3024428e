"""Query registry: every operator from SURVEY.md §2 (plus the scale
extensions) as a named (Spark callable, DuckDB oracle SQL) pair.

The Spark side is idiomatic DataFrame code (what this engine IS); the
oracle side is ANSI SQL the driver runs on DuckDB over the same parquet
tables. Column names and numeric determinism rules (see
``functions/numeric.py``) must agree exactly — the harness hash-compares
values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None => non-SQL-expressible, rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False,
          doc: str = ""):
    def deco(fn):
        if name in REGISTRY:
            # a silent overwrite would drop a query from the driver's
            # correctness matrix with no failing signal
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline, doc)
        return fn
    return deco


def load_registry() -> dict[str, QuerySpec]:
    # Import side-effect modules once, on demand.
    from distributed_computing_projects_spark.queries import (  # noqa: F401
        reference,
        relational,
        extensions,
        streaming_queries,
    )
    return REGISTRY
