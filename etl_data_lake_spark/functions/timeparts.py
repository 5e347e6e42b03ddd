"""Time-dimension derivation — SURVEY.md §2.8 F1-F3, F6.

The reference builds its ``time`` table with TWO identical Python row
UDFs that format epoch-ms through the driver's LOCAL timezone
(etl.py:144-153, quirks Q1-Q3) and mislabels day-of-week-in-month as
"weekday" (``date_format(c,'F')``, quirk Q4). This module is the
fixed, codegen-friendly version: built-in functions only, UTC/ntz
semantics, ISO weekday.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_millis_to_ts(col: Column) -> Column:
    """epoch-ms long → timestamp (replaces reference UDFs U1/U2)."""
    return F.timestamp_millis(col.cast("long"))


def time_dimension(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Distinct timestamps → (start_time, hour, day, week, month, year,
    weekday) — the reference ``time`` table (etl.py:156-164).

    ``weekday`` is ISO day-of-week (1=Mon..7=Sun) — deliberate fix of
    reference quirk Q4. Parts are cast to long so the schema matches
    ANSI engines' BIGINT extraction results.
    """
    t = F.col(ts_col)
    return df.select(
        t.alias("start_time"),
        F.hour(t).cast("long").alias("hour"),
        F.dayofmonth(t).cast("long").alias("day"),
        F.weekofyear(t).cast("long").alias("week"),
        F.month(t).cast("long").alias("month"),
        F.year(t).cast("long").alias("year"),
        (F.weekday(t) + F.lit(1)).cast("long").alias("weekday"),
    ).dropDuplicates(["start_time"])
