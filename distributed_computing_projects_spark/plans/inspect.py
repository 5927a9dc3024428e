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


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, (
        f"expected >= {at_least} BroadcastHashJoin, found {n}; plan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    """The scale guard for every self-join operator (LSH bands, simhash
    bytes, cosine buckets): candidate generation must be an equi-join,
    never a product."""
    plan = physical_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"forbidden {bad} in plan:\n{plan}"


def assert_topk_not_global_sort(df: DataFrame) -> None:
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    partition heaps + driver merge), not a global Sort + Limit."""
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, (
        f"expected TakeOrderedAndProject; plan:\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, table_path_fragment: str,
                            cols: set[str]) -> None:
    """Column pruning: the scan of the named file must read exactly
    ``cols`` (a scan reading all columns for a narrow projection is a
    100 TB bug, SURVEY §4.2)."""
    import re

    plan = physical_plan(df)
    scans = re.findall(
        r"Location:[^\n]*" + re.escape(table_path_fragment) + r"[^\n]*\n(?:[^\n]*\n)*?ReadSchema: ([^\n]*)",
        plan,
    )
    assert scans, f"no parquet scan of {table_path_fragment!r} in plan:\n{plan}"
    for schema in scans:
        got = set(re.findall(r"(\w+):", schema))
        assert got <= cols, (
            f"scan of {table_path_fragment} reads {got - cols} beyond "
            f"{cols}; ReadSchema={schema}\nplan:\n{plan}"
        )
