"""Trailing-window anomaly scores — flag values that break from their
own recent history (spend spikes, event-rate surges, sensor drift),
the observability query family layered on the same window-frame
machinery as `window_frame_trailing_spend`.

``z = (x − mean(trailing)) / stddev(trailing)`` where the trailing
frame covers the ``window`` rows STRICTLY BEFORE the current one (a
point must not contaminate its own baseline — including it shrinks
every spike's score and can hide single-point anomalies entirely).
Rows with fewer than ``min_periods`` trailing points, or a
zero-variance baseline, score null: "no evidence" is not "normal".

One shuffle (the partition keys), streaming frame evaluation, pure
JVM — at 100 TB this is a single window pass with sort spill, no
Python, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trailing_zscores(
    df: DataFrame,
    value_col: str,
    part_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    window: int = 10,
    min_periods: int = 3,
    out_col: str = "zscore",
) -> DataFrame:
    """Append ``out_col`` (double, null when the baseline is too thin
    or flat). ``order_cols`` must be a total order within each
    partition or the frame content — and the score — is ambiguous."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 1 <= min_periods <= window:
        raise ValueError(
            f"min_periods must be in [1, {window}], got {min_periods}"
        )
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    w = (
        Window.partitionBy(*[F.col(c) for c in part_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col).cast("double")
    mean, std = F.avg(x).over(w), F.stddev_samp(x).over(w)
    n = F.count(x).over(w)
    return df.withColumn(
        out_col,
        F.when(
            (n >= min_periods) & (std > 0), (x - mean) / std
        ),
    )


def anomalies(
    df: DataFrame,
    value_col: str,
    part_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    threshold: float = 3.0,
    window: int = 10,
    min_periods: int = 3,
) -> DataFrame:
    """Only the rows whose |z| exceeds ``threshold`` — the alert feed."""
    scored = trailing_zscores(
        df, value_col, part_cols, order_cols, window, min_periods
    )
    return scored.where(F.abs(F.col("zscore")) > threshold)
