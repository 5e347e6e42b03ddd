from etl_data_lake_spark.operators.relational import (
    dedup_exact,
    dedup_latest,
    drop_null_keys,
    project_rename,
)
from etl_data_lake_spark.operators.anomaly import anomalies, trailing_zscores
from etl_data_lake_spark.operators.expectations import (
    expectations_report,
    orphan_count,
    quarantine,
)
from etl_data_lake_spark.operators.funnel import funnel_counts, funnel_times
from etl_data_lake_spark.operators.joins import asof_join, dim_join
from etl_data_lake_spark.operators.sampling import weighted_sample
from etl_data_lake_spark.operators.sketches import (
    distinct_sketches,
    rollup_distinct,
)
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
    "funnel_times",
    "funnel_counts",
    "expectations_report",
    "quarantine",
    "orphan_count",
    "weighted_sample",
    "distinct_sketches",
    "rollup_distinct",
    "trailing_zscores",
    "anomalies",
]
