from etl_data_lake_spark.dedup.boilerplate import (
    boilerplate_lines,
    line_stats,
    strip_boilerplate,
)
from etl_data_lake_spark.dedup.contamination import (
    contaminated_spans,
    contamination_stats,
    contamination_stream_sink,
    excise_spans,
)
from etl_data_lake_spark.dedup.exact import canonicalize_exact
from etl_data_lake_spark.dedup.jaccard import shingle_table, jaccard_pairs
from etl_data_lake_spark.dedup.minhash import minhash_lsh_pairs, minhash_signatures
from etl_data_lake_spark.dedup.simhash import simhash_table
from etl_data_lake_spark.dedup.semantic import (
    blocked_near_dup_pairs,
    semantic_dedup_keep,
)
from etl_data_lake_spark.dedup.substring import (
    repeated_span_stats,
    repeated_spans,
)

__all__ = [
    "canonicalize_exact",
    "shingle_table",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_table",
    "repeated_spans",
    "repeated_span_stats",
    "blocked_near_dup_pairs",
    "semantic_dedup_keep",
    "line_stats",
    "boilerplate_lines",
    "strip_boilerplate",
    "contaminated_spans",
    "contamination_stats",
    "contamination_stream_sink",
    "excise_spans",
]
