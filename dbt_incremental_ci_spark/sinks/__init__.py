from dbt_incremental_ci_spark.sinks.layout import (  # noqa: F401
    write_clustered,
    write_compacted,
    write_zordered,
    zorder_key,
)
