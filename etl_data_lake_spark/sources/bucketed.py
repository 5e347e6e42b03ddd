"""Bucketed tables: pre-shuffled layouts for repeated co-located joins.

The reference re-shuffles its enrichment join input on every run (its
only join strategy is whatever the engine picks per query). For fact ⋈
fact joins that recur at 100 TB — lineitem ⋈ orders on the order key
every day — the shuffle IS the bill. Bucketing pays it once at write:
``bucketBy(n, key)`` hash-partitions files on disk, and every later
equi-join or aggregation on that key reads co-located buckets with NO
Exchange in the plan (tests assert that on the actual plan string).

Bucket-count choice at scale: buckets ≈ table_size / target_task_input
(128-256 MB), rounded to a multiple of cluster parallelism; both join
sides must agree on (count, key) or Spark falls back to shuffling the
disagreeing side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as an EXTERNAL bucketed+sorted parquet table (explicit
    path — the metastore only keeps the bucketing metadata)."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(
        buckets, *bucket_cols
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
