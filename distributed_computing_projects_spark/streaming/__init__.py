from distributed_computing_projects_spark.streaming.windows import (
    dedup_within_watermark,
    interval_join_clicks_purchases,
    read_events_stream,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
    running_user_totals,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregate",
    "running_user_totals",
    "dedup_within_watermark",
    "interval_join_clicks_purchases",
]
