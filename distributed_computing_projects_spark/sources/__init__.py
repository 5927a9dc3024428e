from distributed_computing_projects_spark.sources.registry import (
    TABLE_NAMES,
    load_table,
    load_all,
    register_views,
)
from distributed_computing_projects_spark.sources.text import read_lines

__all__ = ["TABLE_NAMES", "load_table", "load_all", "register_views", "read_lines"]
