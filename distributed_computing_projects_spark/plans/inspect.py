"""Physical-plan inspection helpers.

The reference has no optimizer to inspect (SURVEY §4); for this engine
the plan IS the performance contract, so tests assert on it: filters
reach the parquet scan, small dimensions broadcast, codegen spans
exist. These run in CI at tiny SF but guard the 100 TB plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join; plan:\n{plan}"
    )
