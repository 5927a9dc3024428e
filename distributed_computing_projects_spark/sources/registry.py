"""Table registry over the driver-generated parquet testdata.

The reference resolves dataset names through the SDFS master's
``fileMap``/``sdfsFNameMap`` (mp3/src/sdfsmaster.go:17-25); here a name
resolves to ``<sf_dir>/<name>.parquet`` and Spark's FileSourceScanExec
does split planning (the reference's line-aligned ``GetLogicalSplits``,
mp3/src/sdfs.go:94-106, is built into the datasource layer).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run
    against the same names the DuckDB oracle uses."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
