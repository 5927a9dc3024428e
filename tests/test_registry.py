"""Registry meta-invariants: the guards that keep the driver matrix
honest without running the full differential harness.

- every generated ``MATRIX_ORDER`` name must resolve (a stale name
  would silently drop a query from the front of the driver's ~50-row
  matrix);
- every oracle must parse AND bind in DuckDB over the real tables;
- Spark and oracle column sets must agree for every query (the
  driver's hash compare sorts columns BY NAME — a mismatch fails the
  round even when values are identical). Checked lazily: Spark schema
  from the unexecuted plan, DuckDB schema via LIMIT 0, so the whole
  registry validates in seconds.

Streaming queries are excluded from the Spark side (building their
frame RUNS the stream); their oracles still parse-check, and their
schemas are covered by tests/test_streaming.py and the harness proper.
"""

from __future__ import annotations

import duckdb
import pytest

from distributed_computing_projects_spark.queries import load_registry
from distributed_computing_projects_spark.queries._matrix_first import (
    MATRIX_ORDER,
)
from distributed_computing_projects_spark.sources.registry import TABLE_NAMES


@pytest.fixture(scope="module")
def registry():
    return load_registry()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _is_streaming(name: str) -> bool:
    return name.startswith("streaming_") or name == "user_running_totals_final"


def test_matrix_first_names_resolve(registry):
    missing = [n for n in MATRIX_ORDER if n not in registry]
    assert missing == [], f"MATRIX_ORDER references unknown queries: {missing}"


def test_no_duplicate_matrix_entries():
    assert len(MATRIX_ORDER) == len(set(MATRIX_ORDER))


def test_every_oracle_parses_and_binds(registry, duck):
    bad = {}
    for name, spec in registry.items():
        if spec.oracle is None:
            continue
        try:
            duck.execute(f"SELECT * FROM ({spec.oracle}) q LIMIT 0")
        except Exception as e:  # noqa: BLE001 - report all failures at once
            bad[name] = str(e).splitlines()[0]
    assert bad == {}


def test_spark_and_oracle_column_sets_agree(spark, sf_dir, registry, duck):
    bad = {}
    for name, spec in registry.items():
        if spec.oracle is None or _is_streaming(name):
            continue
        spark_cols = set(spec.fn(spark, sf_dir).columns)
        oracle_cols = set(
            duck.execute(
                f"SELECT * FROM ({spec.oracle}) q LIMIT 0"
            ).df().columns
        )
        if spark_cols != oracle_cols:
            bad[name] = (sorted(spark_cols), sorted(oracle_cols))
    assert bad == {}, f"column mismatch (spark vs oracle): {bad}"
