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
    # Runtime-settable confs the queries depend on, applied here (not
    # only in session.py) so results are correct under a session we
    # didn't build, e.g. the driver's own harness:
    # - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
    #   parquet reader otherwise rejects outright;
    # - UTC session TZ: timestamp values must render identically to the
    #   DuckDB oracle's naive-UTC timestamps wherever the host TZ.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong it
    # arrives as a bigint of nanoseconds — convert (µs resolution,
    # verified lossless for the driver data).
    if dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run
    against the same names the DuckDB oracle uses."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
