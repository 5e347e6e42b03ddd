"""Mergeable distinct-count sketches — the "cube of sketches" pattern
for 100 TB dashboards: sketch ONCE at fine granularity (e.g. per day ×
event type), persist the sketch column like any other, and answer any
coarser COUNT(DISTINCT) by MERGING sketches — no rescan of the raw
data, and unlike pre-computed counts, distinct counts compose (you
cannot add daily distinct users into monthly; you can union their
sketches).

Built on Spark 4's native Apache DataSketches HLL functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
JVM-side, map-side combined, binary-typed sketch payloads that write
to parquet unchanged. The estimate error is ~1.04/√2^lg_k (~1.6% at
the default lg_k=12); a merged estimate may differ slightly from a
direct sketch of the union (representation changes on merge), which
is inherent to HLL — the tests pin both to the exact answer within
tolerance rather than to each other.

Complements the existing approx family: approx_count_distinct (HLL++,
no reusable payload) answers one query; a sketch column answers every
future rollup of it. approx_percentile covers quantiles; this covers
distinct cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def distinct_sketches(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """→ one row per group: the grouping columns plus a BINARY HLL
    sketch of ``value_col``'s distinct values. One shuffle, map-side
    combined (sketches fold associatively). Persist this instead of
    raw ids: it is the fine-granularity base every rollup merges."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def rollup_distinct(
    sketches: DataFrame,
    group_cols: tuple[str, ...],
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain: → one row
    per ``group_cols`` subset (empty tuple = one global row) with the
    merged-estimate ``out_col`` (long). Cost is proportional to the
    NUMBER OF SKETCH ROWS, not the raw data — this is the whole point:
    a month×type→month rollup touches 31 sketches per type, not a
    month of events."""
    merged = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))
    ).alias(out_col)
    if group_cols:
        return sketches.groupBy(*[F.col(c) for c in group_cols]).agg(merged)
    return sketches.agg(merged)
