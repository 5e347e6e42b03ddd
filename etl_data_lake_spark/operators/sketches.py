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


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (round 9) — frequent items with PROVEN
# bounds and bounded memory. The exact alternative (group-by the full
# key space, as word_histogram does) shuffles |distinct keys| rows;
# at 100 TB vocabularies that shuffle IS the job. Misra–Gries keeps
# ``capacity`` counters per task and the merge shuffles only
# ≤ (capacity+1)·partitions summary rows — candidates, not the key
# space — at the cost of bounded, REPORTED uncertainty:
#
# * per task: an item's counter undercounts it by at most that task's
#   decrement total d_p, and d_p ≤ n_p/(capacity+1) by construction
#   (each decrement event consumes capacity+1 observations);
# * merged: true_count ∈ [count_lower, count_lower + Σd_p] for every
#   item, and every item with true_count > Σd_p is GUARANTEED present
#   (absence implies count_lower = 0, hence true ≤ Σd_p); since
#   Σd_p ≤ N/(capacity+1), anything more frequent than
#   N/(capacity+1) always surfaces.
#
# The candidate set and the lower bounds depend on the physical
# partition layout (Misra–Gries is order-sensitive) — the BOUNDS are
# always valid, the exact numbers are not layout-canonical; tests pin
# the guarantees, never the incidental values.
# ---------------------------------------------------------------------------


def _mg_partials(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-task Misra–Gries partial summaries: ≤ capacity counter rows
    plus one null-item sentinel carrying (decrements, observations)
    per task. Shared by the batch operator and the streaming sink."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    field = df.schema[col]
    if field.dataType.simpleString() != "string":
        raise ValueError(
            f"heavy_hitters needs a string column; {col!r} is "
            f"{field.dataType.simpleString()} — cast explicitly"
        )

    out_schema = StructType(
        [
            StructField("item", StringType()),   # null = sentinel row
            StructField("est", LongType()),
            StructField("dec", LongType()),
            StructField("n", LongType()),
        ]
    )

    def summarize(it):
        counters: dict[str, int] = {}
        dec = 0
        n = 0
        for pdf in it:
            for v in pdf[col]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                n += 1
                c = counters.get(v)
                if c is not None:
                    counters[v] = c + 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all event: one unit off every counter
                    # AND the unmatched new item — capacity+1
                    # observations consumed per event
                    dec += 1
                    dead = [w for w, c2 in counters.items() if c2 == 1]
                    for w in counters:
                        counters[w] -= 1
                    for w in dead:
                        del counters[w]
        rows = [(w, c, 0, 0) for w, c in counters.items()]
        rows.append((None, 0, dec, n))
        yield pd.DataFrame(rows, columns=["item", "est", "dec", "n"])

    return df.select(col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    col: str,
    capacity: int = 256,
    k: int | None = None,
) -> DataFrame:
    """→ (item, count_lower, count_upper, n_total): Misra–Gries
    frequent items over a STRING column, one pass. Every item whose
    true count exceeds ``n_total/(capacity+1)`` is present;
    ``count_lower ≤ true ≤ count_upper`` always. ``k`` keeps only the
    top-k by count_lower (item tie-break); default returns every
    surviving candidate. Nulls are ignored (no evidence)."""
    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    summary = _mg_partials(df, col, capacity)
    agg = summary.groupBy("item").agg(
        F.sum("est").alias("_est"),
        F.sum("dec").alias("_dec"),
        F.sum("n").alias("_n"),
    )
    # the aggregate is tiny (≤ capacity·tasks + 1 rows): the global
    # window totals keep this ONE plan with one consumer of the scan
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    with_tot = agg.select(
        "item",
        F.col("_est"),
        F.sum("_dec").over(w_all).alias("_err"),
        F.sum("_n").over(w_all).alias("n_total"),
    )
    out = with_tot.where(F.col("item").isNotNull()).select(
        "item",
        F.col("_est").alias("count_lower"),
        (F.col("_est") + F.col("_err")).alias("count_upper"),
        "n_total",
    )
    if k is not None:
        from etl_data_lake_spark.operators.topk import top_k

        out = top_k(
            out, [F.desc("count_lower"), F.asc("item")], k
        )
    return out


# ---------------------------------------------------------------------------
# Streaming heavy hitters — the Misra–Gries summary is MERGEABLE
# (Agarwal et al. 2012): two summaries add counter-wise, then
# compress back to capacity by subtracting the (capacity+1)-th
# largest value from every counter (dropping non-positives) and
# charging that value to the decrement total. Errors ADD — the merged
# bounds stay valid — so a foreachBatch sink can fold every
# micro-batch into one persisted ≤ capacity+1-row state and serve
# all-time frequent items at any moment, without ever re-scanning
# history. Exactly-once rides the txn overwrite watermark (batch id =
# txn seq): a replayed micro-batch recomputes but its commit no-ops.
# ---------------------------------------------------------------------------


def _mg_merge(
    counters: dict, dec: int, adds: dict, add_dec: int, capacity: int
) -> tuple[dict, int]:
    """Merge counter maps and compress to ``capacity`` (deterministic:
    the subtracted value is the (capacity+1)-th largest count)."""
    for w, c in adds.items():
        counters[w] = counters.get(w, 0) + c
    dec += add_dec
    if len(counters) > capacity:
        v = sorted(counters.values(), reverse=True)[capacity]
        counters = {w: c - v for w, c in counters.items() if c - v > 0}
        dec += v
    return counters, dec


def heavy_hitters_sink(
    spark,
    path: str,
    col: str,
    capacity: int = 256,
    app_id: str = "__mg_sink__",
):
    """``foreachBatch`` function maintaining an all-time Misra–Gries
    state at ``path`` (a txn table): each micro-batch contributes its
    per-task partials (the same one-pass mapInPandas as the batch
    operator), the driver folds them into the stored state
    (≤ capacity+1 rows read + written per batch), and the overwrite
    commits with the batch id as txn seq — replays no-op, the sink is
    exactly-once under at-least-once drivers. Read the state with
    :func:`read_heavy_hitters`; the bound/presence guarantees are the
    batch operator's, with errors accumulated across the stream's
    whole history (as they must be — the state IS the history's
    summary)."""
    from etl_data_lake_spark.sources.txn import TxnTable

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    tbl = TxnTable(spark, str(path))

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        parts = (
            _mg_partials(batch_df, col, capacity)
            .groupBy("item")
            .agg(
                F.sum("est").alias("est"),
                F.sum("dec").alias("dec"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        adds, add_dec, add_n = {}, 0, 0
        for r in parts:
            if r["item"] is None:
                add_dec, add_n = int(r["dec"]), int(r["n"])
            else:
                adds[r["item"]] = int(r["est"])
        counters, dec, n = {}, 0, 0
        if tbl.latest_version() > 0:
            for r in tbl.snapshot().collect():
                if r["item"] is None:
                    dec, n = int(r["dec"]), int(r["n"])
                else:
                    counters[r["item"]] = int(r["est"])
        counters, dec = _mg_merge(counters, dec, adds, add_dec, capacity)
        n += add_n
        rows = [(w, c, 0, 0) for w, c in sorted(counters.items())]
        rows.append((None, 0, dec, n))
        state = spark.createDataFrame(
            rows, "item string, est long, dec long, n long"
        )
        tbl.overwrite(state, app_id=app_id, txn_seq=batch_id)

    return fn


def read_heavy_hitters(
    spark, path: str, k: int | None = None
) -> DataFrame:
    """The persisted streaming state as the batch operator's contract:
    (item, count_lower, count_upper, n_total)."""
    from etl_data_lake_spark.sources.txn import TxnTable

    tbl = TxnTable(spark, str(path))
    rows = tbl.snapshot().collect()
    dec = n = 0
    items = []
    for r in rows:
        if r["item"] is None:
            dec, n = int(r["dec"]), int(r["n"])
        else:
            items.append((r["item"], int(r["est"])))
    out_rows = [(w, c, c + dec, n) for w, c in sorted(items)]
    out = spark.createDataFrame(
        out_rows,
        "item string, count_lower long, count_upper long, n_total long",
    )
    if k is not None:
        from etl_data_lake_spark.operators.topk import top_k

        out = top_k(out, [F.desc("count_lower"), F.asc("item")], k)
    return out


def distinct_sketch_sink(
    spark,
    path: str,
    group_cols: tuple[str, ...],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    app_id: str = "__hll_sink__",
):
    """``foreachBatch`` function maintaining per-group HLL sketches at
    ``path`` (a txn table of ``group_cols + (sketch,)``): each
    micro-batch is sketched (one shuffle, map-side combined), merged
    with the stored sketches via ``hll_union_agg`` — HLL's merge is
    exact w.r.t. the sketch state, so the maintained sketch equals a
    from-scratch sketch of the whole history — and published with the
    batch id as txn seq (replays no-op; exactly-once under
    at-least-once drivers). Answer distinct counts at any grain, any
    time, with :func:`rollup_distinct` over the stored rows — a
    continuously-fresh "cube of sketches" whose refresh cost is the
    micro-batch, never the history."""
    from etl_data_lake_spark.sources.txn import TxnTable

    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    tbl = TxnTable(spark, str(path))

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        fresh = distinct_sketches(
            batch_df, group_cols, value_col, lg_k=lg_k
        )
        if tbl.latest_version() > 0:
            merged = (
                tbl.snapshot()
                .unionByName(fresh)
                .groupBy(*[F.col(c) for c in group_cols])
                .agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
            )
        else:
            merged = fresh
        tbl.overwrite(merged, app_id=app_id, txn_seq=batch_id)

    return fn
