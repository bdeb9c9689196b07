from dbt_incremental_ci_spark.incremental.merge import (
    incremental_upsert,
    read_watermark,
    watermark_filter,
)

__all__ = ["incremental_upsert", "read_watermark", "watermark_filter"]
