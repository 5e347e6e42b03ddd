from etl_data_lake_spark.similarity.bq import bq_encode, bq_topk, train_bq
from etl_data_lake_spark.similarity.bruteforce import cosine_topk
from etl_data_lake_spark.similarity.hnsw import hnsw_topk
from etl_data_lake_spark.similarity.hnsw_index import HnswIndex
from etl_data_lake_spark.similarity.index import IvfIndex
from etl_data_lake_spark.similarity.metrics import (
    retrieval_metrics,
    retrieval_summary,
)
from etl_data_lake_spark.similarity.ivf import ivf_topk
from etl_data_lake_spark.similarity.lsh import lsh_bucket_topk, with_lsh_buckets
from etl_data_lake_spark.similarity.kmeans import kmeans_fit
from etl_data_lake_spark.similarity.pca import (
    pca_fit,
    pca_reconstruct,
    pca_transform,
)
from etl_data_lake_spark.similarity.opq import (
    fit_rotation,
    opq_topk,
    rotate_vectors,
)
from etl_data_lake_spark.similarity.pq import pq_encode, pq_topk
from etl_data_lake_spark.similarity.sq import (
    sq_encode,
    sq_reconstruct,
    sq_topk,
    train_sq,
)

__all__ = [
    "cosine_topk",
    "with_lsh_buckets",
    "lsh_bucket_topk",
    "ivf_topk",
    "hnsw_topk",
    "pq_encode",
    "pq_topk",
    "fit_rotation",
    "rotate_vectors",
    "opq_topk",
    "train_sq",
    "sq_encode",
    "sq_reconstruct",
    "sq_topk",
    "train_bq",
    "bq_encode",
    "bq_topk",
    "IvfIndex",
    "HnswIndex",
    "retrieval_metrics",
    "retrieval_summary",
    "kmeans_fit",
    "pca_fit",
    "pca_transform",
    "pca_reconstruct",
]
