"""Join operators.

Covers SURVEY.md §2.3 (J1-J4): left-outer enrichment on non-key
columns (reference etl.py:175-179), fact→dim equi-joins, compound-key
joins — plus the as-of join the reference lacks (a standard
time-series enrichment primitive).

Scale notes: every dimension join takes an explicit ``broadcast()``
hint when the build side is known-small; AQE's runtime auto-broadcast
catches the rest. The as-of join is expressed as a union + window
(one shuffle on the join key) instead of a per-row subquery — the
composition-of-builtins strategy for operators Spark lacks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact ⋈ dimension with a broadcast hint on the dim side.

    The reference relies on Spark to pick the strategy for its
    songs-side join (etl.py:175-179); at 100 TB an explicit hint on
    known-small dims avoids a sort-merge shuffle of the fact table
    entirely.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` matching on ``on`` (backward as-of join).

    Implementation: union both sides tagged, sort within key by time,
    and carry the last-seen right values forward with
    ``last(ignorenulls=True)`` — one shuffle on ``on``, no range
    self-join blowup. DuckDB expresses the same thing natively as
    ``ASOF JOIN``; that is the oracle.

    At scale this is the standard pattern (union + window) and is
    skew-sensitive only on ``on`` — salt if a single key dominates.
    """
    lt = left.withColumn("__t", F.col(left_ts).cast("timestamp_ntz")).withColumn(
        "__side", F.lit(1)
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp_ntz").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # align schemas for the union
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.select(*sorted(lt.columns)).unionByName(rt.select(*sorted(rt.columns)))

    # right rows sort before left rows at equal timestamps (__side 0 < 1)
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_cols]
    )
