from etl_data_lake_spark.similarity.bruteforce import cosine_topk
from etl_data_lake_spark.similarity.lsh import lsh_bucket_topk, with_lsh_buckets

__all__ = ["cosine_topk", "with_lsh_buckets", "lsh_bucket_topk"]
