"""Projection / filter / dedup operators.

Covers SURVEY.md §2.2 (P1-P8) and §2.4 A1 — the reference's
filter→select/alias→dropna→dropDuplicates idiom (etl.py:67-71, 79-87,
130-138), expressed as pure ``DataFrame → DataFrame`` transforms.

Scale notes: full-row ``dropDuplicates()`` (reference A1) is a hash
aggregation over EVERY column — at 100 TB that shuffles the whole
table on a wide key. ``dedup_exact(subset=...)`` narrows the shuffle
key to the PK; ``dedup_latest`` replaces nondeterministic "keep any
row" with "keep newest" via a window, which is what the reference's
users table actually wanted (quirk Q7).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def project_rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """``SELECT src AS dst, ...`` — reference etl.py:81-85, 132-136."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def drop_null_keys(df: DataFrame, keys: Sequence[str], empty_is_null: bool = True) -> DataFrame:
    """Drop rows whose key is null — and, like the reference, also empty-string.

    The reference needs BOTH ``.filter('song_id != ""')`` and
    ``.dropna(subset=['song_id'])`` (etl.py:68-70) because empty string
    and null are distinct; we fold the two into one operator.
    """
    out = df.na.drop(how="any", subset=list(keys))
    if empty_is_null:
        for k in keys:
            if dict(df.dtypes).get(k) == "string":
                out = out.filter(F.col(k) != "")
    return out


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup: hash-aggregate on ``subset`` (or all columns).

    Maps to a partial+final HashAggregate — no pre-sort, map-side
    combine for free. Equivalent to the reference's ``dropDuplicates``
    (etl.py:71, 87, 138).
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_latest(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Keep the newest row per key (deterministic dedup).

    ``row_number() = 1`` over (keys, order desc). One shuffle on the
    key — same cost as dropDuplicates(subset) but with defined
    semantics. This is the SCD-style fix for reference quirk Q7 (a
    user appears once per ``level`` value, etl.py:130-138).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
