"""Exact deduplication: content-hash groupBy with a deterministic
canonical representative.

The reference's ``dropDuplicates()`` (etl.py:71,87,138) keeps an
ARBITRARY row per group; for a reproducible pipeline we keep
``min(id)``. One hash aggregation on the content hash — at 100 TB
group on the 128-bit digest, never on the raw text (shuffle width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_exact(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (content_md5, canonical_id, dup_count); one row per distinct
    content, canonical = lowest id."""
    return (
        df.select(
            F.md5(F.col(content_col).cast("binary")).alias("content_md5"),
            F.col(id_col),
        )
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )
