"""Sign-random-projection LSH for cosine ANN — a scale path.

(Random hyperplane rounding per Charikar STOC 2002; multi-table
scheme per Gionis/Indyk/Motwani VLDB 1999.)

L hash tables × p hyperplanes: a vector's bucket in table t is the
p-bit sign pattern of its projections onto that table's planes.
Collision probability for angle θ is (1-θ/π)^p per table; L tables
multi-probe the complement, so recall for cos≈0.5 at (L=8, p=4) is
~0.8 while each table's buckets hold |corpus|/2^p vectors.

Planes are DETERMINISTIC pseudo-random (integer LCG on (table, plane,
dim), mapped to [-1,1]) — no fit step, no state to persist, identical
across runs. Bucketing computes all tables·planes projections in one
Arrow-batched numpy matmul per batch (the same wide-matrix regime as
ivf.py cell assignment — a JVM fold per plane would interpret
tables·planes·dims expression nodes per row); candidates then
re-score with the exact JVM fold, so every emitted score stays
bit-deterministic — numpy only selects candidates.

At 100 TB: bucketing is one narrow shuffle on (table, bucket); the
exact re-score touches only candidate pairs. Skewed buckets (dense
regions) are AQE's skew-join case, or raise p.

Measured recall@10 vs brute force (sf0.01, 500 random vectors — LSH's
worst case, no cluster structure — 20 queries, p=4 planes):

    tables L     2     4     8     16
    recall       0.29  0.40  0.64  0.87

Each doubling of L roughly halves the miss rate at ~2× bucket-join
cost — L is the recall/throughput knob, p the bucket-size knob.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.vectors import as_double, cosine
from etl_data_lake_spark.sources.catalog import fan_out

# LCG constants (Numerical Recipes); plane component in [-1, 1]
_A, _C, _M = 1664525, 1013904223, 2**32


def _plane(table: int, plane: int, dims: int) -> list[float]:
    out = []
    seed = (table * 131 + plane) & 0xFFFFFFFF
    for d in range(dims):
        seed = (_A * (seed + d * 2654435761) + _C) % _M
        out.append(seed / _M * 2.0 - 1.0)
    return out


def _bucket_udf(dims: int, tables: int, planes: int):
    """Pandas UDF: vector → its bucket id in every table, one batch
    matmul against the (tables·planes × dims) plane matrix."""
    from pyspark.sql.functions import pandas_udf

    plane_mat = np.asarray(
        [_plane(t, p, dims) for t in range(tables) for p in range(planes)]
    )
    bit_weights = np.array([1 << p for p in range(planes)])

    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vs.to_numpy()).astype(np.float64)
        signs = (v @ plane_mat.T) > 0
        b = signs.reshape(len(v), tables, planes) @ bit_weights
        return pd.Series(list(b.astype("int32")))

    return pandas_udf(buckets, "array<int>")


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    tables: int = 8,
    planes: int = 4,
) -> DataFrame:
    """→ df exploded to (…, table, bucket): one row per hash table."""
    buckets = _bucket_udf(dims, tables, planes)
    return (
        df.withColumn("__b", buckets(as_double(vec_col)))
        .select("*", F.posexplode("__b").alias("table", "bucket"))
        .drop("__b")
    )


def cap_buckets(
    bucketed: DataFrame, bucket_cap: int, order_col: str = "neighbor_id"
) -> DataFrame:
    """Keep at most ``bucket_cap`` rows per (table, bucket), selected by
    xxhash64(order_col) order — a deterministic unbiased sample. Bounds
    the candidate join against degenerate dense buckets (mass-duplicate
    embeddings) at queries·tables·cap candidates."""
    w = Window.partitionBy("table", "bucket").orderBy(
        F.xxhash64(order_col), order_col
    )
    return (
        bucketed.withColumn("__bn", F.row_number().over(w))
        .where(F.col("__bn") <= bucket_cap)
        .drop("__bn")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    tables: int = 8,
    planes: int = 4,
    bucket_cap: int | None = None,
    predicate=None,
) -> DataFrame:
    """ANN top-k: candidates = corpus sharing any (table, bucket) with
    the query; exact cosine re-score; rank; keep k.

    ``predicate`` (Column or SQL string) restricts the corpus BEFORE
    bucketing — filtered ANN search. Only matching vectors enter the
    candidate buckets, so recall is measured against the FILTERED
    brute-force baseline (not post-filtered top-k, which under-
    returns); the filter sits ahead of the projection and pushes down
    to the scan.

    ``bucket_cap`` bounds the candidate join against dense regions: a
    bucket holding m corpus vectors contributes m candidates per query
    probing it, so a degenerate corpus (mass duplicate embeddings) makes
    the join quadratic. With a cap, each (table, bucket) keeps at most
    ``bucket_cap`` vectors, chosen by xxhash64(neighbor_id) order — a
    deterministic unbiased sample — bounding candidates at
    queries·tables·cap. Recall within the surviving bucket population is
    unchanged (re-score is exact); the sacrifice is among near-identical
    vectors where any representative is an equally good neighbor."""
    if predicate is not None:
        corpus = corpus.where(predicate)
    cb = with_lsh_buckets(
        fan_out(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
            )
        ),
        "cv", dims, tables, planes,
    )
    if bucket_cap is not None:
        cb = cap_buckets(cb, bucket_cap)
    qb = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")),
        "qv", dims, tables, planes,
    )
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )
