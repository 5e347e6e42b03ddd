"""Window operators.

Covers SURVEY.md §2.5 W1 — the reference's surrogate-key generator
(``row_number()`` over (year, month), etl.py:192-200) — plus the
analytic windows (lag/lead/rank/running aggregates) and gap-based
sessionization the reference's event data calls for.

Scale notes (reference quirk Q8): ``row_number`` over a coarse
partition key like (year, month) funnels a month of data through ONE
task's sort. ``surrogate_key`` keeps the reference semantics for
parity; ``stable_id`` is the scale-correct alternative (no shuffle,
no sort, unique but not dense).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    name: str = "surrogate_id",
) -> DataFrame:
    """Dense per-partition surrogate id — reference etl.py:192-200.

    ``order_cols`` MUST be a total order (include a unique tiebreak)
    or ids are nondeterministic across runs.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(name, F.row_number().over(w))


def stable_id(df: DataFrame, name: str = "row_id") -> DataFrame:
    """Cluster-scale unique id: no shuffle, no sort, not dense.

    ``monotonically_increasing_id`` encodes (partition id, offset);
    use it instead of row_number when the key only needs uniqueness.
    """
    return df.withColumn(name, F.monotonically_increasing_id())


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
    name: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the same key exceeds the gap.

    lag → boolean → running sum, all within one window partition on
    ``key``: a single shuffle, fully JVM-side.
    """
    # timestampdiff works for both TIMESTAMP and TIMESTAMP_NTZ (a plain
    # cast-to-long is illegal under ANSI for ntz)
    gap = F.expr(
        f"timestampdiff(SECOND, lag({ts_col}) over "
        f"(partition by {key} order by {ts_col}), {ts_col})"
    )
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    running = Window.partitionBy(key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", is_new).withColumn(
        name, F.sum("__new").over(running)
    ).drop("__new")
