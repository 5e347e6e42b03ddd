"""Top-k (ORDER BY + LIMIT) — SURVEY.md §2.6 T1/T2.

Spark plans ``orderBy(...).limit(k)`` as ``TakeOrderedAndProject``:
each task keeps a k-row heap, the driver merges — a distributed top-k
with NO full sort. That is exactly the plan we want at 100 TB, so the
operator is a thin wrapper that exists to (a) enforce a deterministic
tiebreak and (b) be assertable in tests (plan must NOT contain a
global Sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """``ORDER BY order LIMIT k`` with the caller providing a total
    order (reference README.md:127 carefully adds tiebreak keys so the
    golden outputs are stable — keep that discipline)."""
    return df.orderBy(*order).limit(k)
