from distributed_computing_projects_spark.functions.numeric import (
    dec_sum,
    dec_sum_expr,
    safe_div,
)

__all__ = ["dec_sum", "dec_sum_expr", "safe_div"]
