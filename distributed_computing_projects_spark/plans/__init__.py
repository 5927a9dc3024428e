from distributed_computing_projects_spark.plans.inspect import (
    physical_plan,
    assert_pushed_filters,
    assert_broadcast_join,
)

__all__ = ["physical_plan", "assert_pushed_filters", "assert_broadcast_join"]
