from etl_data_lake_spark.operators.relational import (
    dedup_exact,
    dedup_latest,
    drop_null_keys,
    project_rename,
)
from etl_data_lake_spark.operators.joins import asof_join, dim_join
from etl_data_lake_spark.operators.windows import sessionize, surrogate_key
from etl_data_lake_spark.operators.topk import top_k

__all__ = [
    "project_rename",
    "drop_null_keys",
    "dedup_exact",
    "dedup_latest",
    "dim_join",
    "asof_join",
    "surrogate_key",
    "sessionize",
    "top_k",
]
