from dbt_incremental_ci_spark.streaming.pipeline import (
    incremental_stream,
    windowed_event_counts,
)

__all__ = ["incremental_stream", "windowed_event_counts"]
