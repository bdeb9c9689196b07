from dbt_incremental_ci_spark.plans.registry import Model, ModelRegistry, model
from dbt_incremental_ci_spark.plans.dag import topo_sort, descendants
from dbt_incremental_ci_spark.plans.runner import Engine, RunResult

__all__ = [
    "Model",
    "ModelRegistry",
    "model",
    "topo_sort",
    "descendants",
    "Engine",
    "RunResult",
]
