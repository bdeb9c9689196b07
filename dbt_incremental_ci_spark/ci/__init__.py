from dbt_incremental_ci_spark.ci.state import StateStore, diff_state, modified_plus
from dbt_incremental_ci_spark.ci.copier import CopyResult, TableCopier, compute_target_schema
from dbt_incremental_ci_spark.ci.core import SlimCI

__all__ = [
    "StateStore",
    "diff_state",
    "modified_plus",
    "CopyResult",
    "TableCopier",
    "compute_target_schema",
    "SlimCI",
]
