from etl_data_lake_spark.streaming.events import (
    event_stream,
    run_available_now,
    sessionize_stream,
    tumbling_counts,
)

__all__ = [
    "event_stream",
    "tumbling_counts",
    "sessionize_stream",
    "run_available_now",
]
