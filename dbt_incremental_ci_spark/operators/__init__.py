from dbt_incremental_ci_spark.operators import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
