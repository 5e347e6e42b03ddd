from etl_data_lake_spark.operators.relational import (
    dedup_exact,
    dedup_latest,
    drop_null_keys,
    project_rename,
)
from etl_data_lake_spark.operators.anomaly import anomalies, trailing_zscores
from etl_data_lake_spark.operators.diff import (
    corpus_diff,
    corpus_diff_summary,
)
from etl_data_lake_spark.operators.expectations import (
    expectations_report,
    expectations_stream_sink,
    orphan_count,
    quarantine,
)
from etl_data_lake_spark.operators.export import (
    read_export_manifest,
    write_curriculum_shards,
    write_shuffled_shards,
)
from etl_data_lake_spark.operators.profile import (
    drift_report,
    histogram_quantiles,
    merge_histograms,
    numeric_histogram,
    population_stability_index,
    profile,
)
from etl_data_lake_spark.operators.funnel import funnel_counts, funnel_times
from etl_data_lake_spark.operators.joins import (
    asof_join,
    dim_join,
    interval_join,
)
from etl_data_lake_spark.operators.pagerank import pagerank
from etl_data_lake_spark.operators.sampling import (
    split_deterministic,
    split_leakage_safe,
    weighted_sample,
)
from etl_data_lake_spark.operators.sketches import (
    CmsReader,
    QdigestReader,
    cms_collect,
    cms_estimate_col,
    cms_merge,
    cms_sink,
    cms_sketch,
    distinct_overlap,
    distinct_sketch_sink,
    distinct_sketches,
    heavy_hitters,
    heavy_hitters_sink,
    qdigest_collect,
    qdigest_merge,
    qdigest_sink,
    qdigest_sketch,
    quantile_buckets,
    read_cms,
    read_heavy_hitters,
    read_qdigest,
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
    "interval_join",
    "pagerank",
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
    "expectations_stream_sink",
    "corpus_diff",
    "corpus_diff_summary",
    "split_deterministic",
    "split_leakage_safe",
    "heavy_hitters",
    "heavy_hitters_sink",
    "read_heavy_hitters",
    "distinct_sketch_sink",
    "CmsReader",
    "cms_sketch",
    "cms_merge",
    "cms_collect",
    "cms_estimate_col",
    "cms_sink",
    "read_cms",
    "distinct_overlap",
    "QdigestReader",
    "qdigest_sketch",
    "qdigest_merge",
    "qdigest_collect",
    "qdigest_sink",
    "read_qdigest",
    "quantile_buckets",
    "drift_report",
    "population_stability_index",
    "profile",
    "numeric_histogram",
    "merge_histograms",
    "histogram_quantiles",
    "write_shuffled_shards",
    "write_curriculum_shards",
    "read_export_manifest",
]
