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

import numpy as np
import pandas as pd
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


def _mg_update(counters: dict, dec: int, v, capacity: int) -> int:
    """One Misra–Gries observation against a ≤ capacity counter map
    (mutated in place); returns the new decrement total. The ONE copy
    of the decrement-all rule, shared by the global
    (:func:`_mg_partials`) and per-group (:func:`heavy_hitters_by`)
    paths — the two summaries must stay behaviorally identical for
    the documented per-group bound parity, so the inner loop lives
    here exactly once."""
    c = counters.get(v)
    if c is not None:
        counters[v] = c + 1
    elif len(counters) < capacity:
        counters[v] = 1
    else:
        # decrement-all event: one unit off every counter AND the
        # unmatched new item — capacity+1 observations consumed
        dec += 1
        dead = [w for w, c2 in counters.items() if c2 == 1]
        for w in counters:
            counters[w] -= 1
        for w in dead:
            del counters[w]
    return dec


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
                dec = _mg_update(counters, dec, v, capacity)
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


def heavy_hitters_by(
    df: DataFrame,
    group_cols: tuple[str, ...],
    col: str,
    capacity: int = 256,
    k: int | None = None,
    max_groups_per_task: int = 10_000,
) -> DataFrame:
    """Per-group Misra–Gries frequent items — "top terms per language",
    "hot keys per tenant": → (group_cols…, item, count_lower,
    count_upper, n_total) where every bound/presence guarantee of
    :func:`heavy_hitters` holds WITHIN each group (each task keeps an
    independent ≤ capacity-counter summary per group it sees, so
    per-group decrement totals — hence error bounds — never mix).

    Memory honesty: a task's state is capacity × (groups in that
    task); that is the price of one-pass grouped sketching and it is
    bounded ONLY if the group domain is (lang, source, tenant — the
    intended uses). A task observing more than
    ``max_groups_per_task`` distinct groups fails loudly instead of
    silently eating the executor's heap — pre-partition by group or
    raise the limit deliberately. Null group keys are kept as their
    own group (SQL grouping semantics); null items are ignored."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if not group_cols:
        raise ValueError("group_cols must name at least one column; use heavy_hitters for the global form")
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    field = df.schema[col]
    if field.dataType.simpleString() != "string":
        raise ValueError(
            f"heavy_hitters_by needs a string column; {col!r} is "
            f"{field.dataType.simpleString()} — cast explicitly"
        )
    gtypes = [df.schema[g].dataType for g in group_cols]
    out_schema = StructType(
        [StructField(g, t) for g, t in zip(group_cols, gtypes)]
        + [
            StructField("item", StringType()),
            StructField("est", LongType()),
            StructField("dec", LongType()),
            StructField("n", LongType()),
        ]
    )
    gcols = list(group_cols)

    def summarize(it):
        states: dict[tuple, tuple[dict, int, int]] = {}
        for pdf in it:
            # zip the columns directly — itertuples renames columns
            # that aren't valid identifiers
            for *key_vals, v in zip(*[pdf[g] for g in gcols], pdf[col]):
                # normalize missing group keys to None: raw NaN/NaT
                # cells are each a fresh object with NaN != NaN, so
                # without this every null-keyed row would open its own
                # per-task state — breaking the "null keys are one
                # group" contract and spuriously tripping
                # max_groups_per_task.
                key = tuple(
                    None
                    if x is None or (not isinstance(x, (str, bytes)) and pd.isna(x))
                    else x
                    for x in key_vals
                )
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                st = states.get(key)
                if st is None:
                    if len(states) >= max_groups_per_task:
                        raise ValueError(
                            f"heavy_hitters_by: task saw more than "
                            f"{max_groups_per_task} distinct groups — "
                            "pre-partition by group or raise "
                            "max_groups_per_task"
                        )
                    st = ({}, 0, 0)
                counters, dec, n = st
                n += 1
                dec = _mg_update(counters, dec, v, capacity)
                states[key] = (counters, dec, n)
        rows = []
        for key, (counters, dec, n) in states.items():
            for w, c in counters.items():
                rows.append((*key, w, c, 0, 0))
            rows.append((*key, None, 0, dec, n))
        yield pd.DataFrame(
            rows, columns=[*gcols, "item", "est", "dec", "n"]
        )

    summary = df.select(*gcols, col).mapInPandas(summarize, schema=out_schema)
    agg = summary.groupBy(*gcols, "item").agg(
        F.sum("est").alias("_est"),
        F.sum("dec").alias("_dec"),
        F.sum("n").alias("_n"),
    )
    from pyspark.sql import Window

    w_g = Window.partitionBy(*gcols)
    with_tot = agg.select(
        *gcols,
        "item",
        F.col("_est"),
        F.sum("_dec").over(w_g).alias("_err"),
        F.sum("_n").over(w_g).alias("n_total"),
    )
    out = with_tot.where(F.col("item").isNotNull()).select(
        *gcols,
        "item",
        F.col("_est").alias("count_lower"),
        (F.col("_est") + F.col("_err")).alias("count_upper"),
        "n_total",
    )
    if k is not None:
        w_rank = Window.partitionBy(*gcols).orderBy(
            F.desc("count_lower"), F.asc("item")
        )
        out = (
            out.withColumn("_r", F.row_number().over(w_rank))
            .where(F.col("_r") <= k)
            .drop("_r")
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


# ---------------------------------------------------------------------------
# Count–min sketch (round 10) — point-frequency estimates for ANY item
# with one-sided error, completing the sketch family: HLL answers
# distinct counts, Misra–Gries answers "which items are frequent",
# CMS answers "how often did THIS item occur" without keeping the key
# space. depth×width counters (Cormode–Muthukrishnan 2005);
# estimate(x) = min over rows of the counter x hashes to — NEVER an
# undercount, and over by at most e/width · N with probability
# ≥ 1 − e^−depth.
#
# Two properties Misra–Gries cannot offer, both test-pinned:
# * the state is LAYOUT-CANONICAL: counters are sums of per-row hash
#   hits, addition commutes, so any partitioning (and any merge order)
#   yields the IDENTICAL state — bit-equal, not just bound-valid;
# * merge is EXACT: cms(A ⊎ B) == cms(A) + cms(B) counter-wise, so a
#   streaming sink's folded state equals the from-scratch sketch of
#   the whole history, not an approximation of it.
#
# The distributed state is SPARSE (row, pos, cnt) — each task emits
# only its nonzero cells (≤ min(width, task-distinct-items) per row),
# so the shuffle carries candidate cells, never the key space; the
# dense depth×width array (a few KB) materializes only driver-side
# for queries. Hashing is Kirsch–Mitzenmacher double hashing off one
# keyed blake2b digest per distinct item (hashlib — deterministic
# across platforms/processes, no PYTHONHASHSEED exposure), computed
# once per DISTINCT item per batch (Zipf ⇒ value_counts first).
# ---------------------------------------------------------------------------

_CMS_SENTINEL_ROW = -1


def _cms_positions(
    item: str, depth: int, width: int, seed: int
) -> list[int]:
    """The counter position of ``item`` in each of the ``depth`` rows:
    h_i = (h1 + i·h2) mod width over one 16-byte keyed blake2b digest
    (double hashing — pairwise-independent enough for the CMS bound,
    one hash call per item)."""
    import hashlib

    d = hashlib.blake2b(
        item.encode("utf-8"),
        digest_size=16,
        key=seed.to_bytes(8, "little", signed=False),
    ).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    return [((h1 + i * h2) % width) for i in range(depth)]


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """→ the sparse CMS state of ``col``: (row, pos, cnt) for every
    nonzero counter, plus the sentinel row (-1, -1, n_total). ONE
    corpus scan; the only shuffle carries nonzero cells (map-side
    summed per task before emitting). The state is layout-canonical
    and persists like any table; nulls are ignored (no evidence)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    field = df.schema[col]
    if field.dataType.simpleString() != "string":
        raise ValueError(
            f"cms_sketch needs a string column; {col!r} is "
            f"{field.dataType.simpleString()} — cast explicitly"
        )
    out_schema = StructType(
        [
            StructField("row", IntegerType()),
            StructField("pos", IntegerType()),
            StructField("cnt", LongType()),
        ]
    )

    def summarize(it):
        cells: dict[tuple[int, int], int] = {}
        n = 0
        for pdf in it:
            vc = pdf[col].dropna().value_counts()
            for item, c in vc.items():
                n += int(c)
                for i, p in enumerate(
                    _cms_positions(item, depth, width, seed)
                ):
                    key = (i, p)
                    cells[key] = cells.get(key, 0) + int(c)
        rows = [(r, p, c) for (r, p), c in cells.items()]
        rows.append((_CMS_SENTINEL_ROW, _CMS_SENTINEL_ROW, n))
        yield pd.DataFrame(rows, columns=["row", "pos", "cnt"])

    return (
        df.select(col)
        .mapInPandas(summarize, schema=out_schema)
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_merge(*states: DataFrame) -> DataFrame:
    """Counter-wise sum of CMS states (same width/depth/seed — the
    caller's contract, as with HLL lg_k). EXACT: the result is the
    sketch of the concatenated inputs, bit-for-bit."""
    if not states:
        raise ValueError("cms_merge needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


class CmsReader:
    """The dense driver-side view of a CMS state (depth×width longs —
    a few KB), for point queries and as the broadcastable closure of
    :func:`cms_estimate_col`."""

    def __init__(
        self,
        counts,  # numpy (depth, width) int64
        n_total: int,
        width: int,
        depth: int,
        seed: int,
    ):
        self.counts = counts
        self.n_total = n_total
        self.width = width
        self.depth = depth
        self.seed = seed

    def estimate(self, item: str) -> int:
        """min over rows — ≥ the true count always; ≤ true +
        e/width·n_total with probability ≥ 1 − e^−depth."""
        return int(
            min(
                self.counts[i, p]
                for i, p in enumerate(
                    _cms_positions(item, self.depth, self.width, self.seed)
                )
            )
        )


def cms_collect(
    state: DataFrame, width: int = 2048, depth: int = 4, seed: int = 0
) -> CmsReader:
    """Materialize a (possibly sparse, possibly merged) CMS state into
    a :class:`CmsReader`. The collect is ≤ depth·width + 1 rows —
    driver traffic is the sketch, never the data."""
    import numpy as np

    counts = np.zeros((depth, width), dtype="int64")
    n_total = 0
    for r in state.collect():
        if r["row"] == _CMS_SENTINEL_ROW:
            n_total += int(r["cnt"])
            continue
        if not (0 <= r["row"] < depth and 0 <= r["pos"] < width):
            raise ValueError(
                f"CMS cell ({r['row']}, {r['pos']}) outside "
                f"depth={depth} width={width} — params don't match "
                "the sketch"
            )
        counts[r["row"], r["pos"]] += int(r["cnt"])
    return CmsReader(counts, n_total, width, depth, seed)


def cms_estimate_col(
    df: DataFrame,
    col: str,
    reader: CmsReader,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """→ input columns plus ``out_col``: the CMS frequency estimate of
    each value in ``col`` — the sketch broadcasts in the UDF closure
    (a few KB), so scoring any table against a 100 TB corpus's sketch
    is one scan of the SMALL side, zero shuffles, no corpus access."""
    from pyspark.sql.types import LongType

    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )

    @F.pandas_udf(LongType())
    def est(items: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(v) -> int | None:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return None
            e = cache.get(v)
            if e is None:
                e = reader.estimate(v)
                cache[v] = e
            return e

        return items.map(one)

    return df.withColumn(out_col, est(F.col(col)))


def cms_sink(
    spark,
    path: str,
    col: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 0,
    app_id: str = "__cms_sink__",
):
    """``foreachBatch`` function maintaining an all-time CMS at
    ``path`` (a txn table of the sparse state): each micro-batch is
    sketched and counter-summed into the stored state — EXACTLY the
    from-scratch sketch of the whole history, because CMS merge is
    exact — and published with the batch id as txn seq (replays
    no-op; exactly-once under at-least-once drivers). Per-batch cost:
    the micro-batch scan plus ≤ depth·width + 1 state rows, never the
    history. Read with :func:`read_cms`."""
    from etl_data_lake_spark.sources.txn import TxnTable

    tbl = TxnTable(spark, str(path))

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        fresh = cms_sketch(batch_df, col, width=width, depth=depth, seed=seed)
        if tbl.latest_version() > 0:
            fresh = cms_merge(tbl.snapshot(), fresh)
        tbl.overwrite(fresh, app_id=app_id, txn_seq=batch_id)

    return fn


# ---------------------------------------------------------------------------
# Q-digest quantile sketch (round 10 s2) — mergeable quantiles with a
# PROVEN rank-error bound, completing the sketch family: HLL answers
# distinct counts, Misra–Gries frequent items, CMS point frequencies,
# q-digest answers "what is the p99" over any persisted or streamed
# history. The existing quantile surface can't do that:
# approx_percentile is a one-shot aggregate (no reusable state) and
# merge_histograms needs fixed bounds shared up front.
#
# The structure (Shrivastava et al. 2004, public): values are leaves
# of a binary tree over a bounded integer universe [0, 2^L); a digest
# keeps (level, idx, cnt) nodes. COMPRESSION merges any
# (left, right, parent) triple whose sum ≤ t = max(1, n // k) into
# the parent, bottom-up — after which every root path holds ≤ L nodes
# of ≤ t each, so any value's rank is known to within L·t ≤ L·n/k.
# Deterministic (no randomness anywhere), and the merge of two
# digests is COUNT ADDITION — exact, like CMS — with errors adding:
# a folded stream state obeys ε·N on the whole history's N.
#
# Distributed shape mirrors CMS: per task, one pass builds leaf
# counts and compresses LOCALLY (t from the task's own n — the merge
# theorem lets local errors add into the global bound), emitting
# ≤ 3k nodes; the shuffle carries digest nodes, never the value
# space. The dense walk happens only driver-side in QdigestReader.
# Guarantees are layout-INDEPENDENT; the incidental node sets are not
# (Misra–Gries's documented property, same testing discipline).
# ---------------------------------------------------------------------------

_QD_SENTINEL_LEVEL = -1


def _qd_compress(nodes: dict, n: int, k: int, bits: int) -> dict:
    """Bottom-up q-digest compression of {(level, idx): cnt} in place:
    merge (left, right, parent) triples summing ≤ t = ⌊n/k⌋ into the
    parent. t == 0 (n < k) compresses nothing — the digest is EXACT
    below the compression threshold. Deterministic; keeps every
    surviving non-leaf count ≤ t."""
    t = n // k
    if t == 0:
        return nodes
    for level in range(bits):
        idxs = sorted(
            {i >> 1 for (lv, i) in nodes if lv == level}
        )
        for pi in idxs:
            lc = nodes.get((level, 2 * pi), 0)
            rc = nodes.get((level, 2 * pi + 1), 0)
            pc = nodes.get((level + 1, pi), 0)
            s = lc + rc + pc
            if 0 < s <= t:
                nodes.pop((level, 2 * pi), None)
                nodes.pop((level, 2 * pi + 1), None)
                nodes[(level + 1, pi)] = s
    return nodes


def qdigest_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    universe_bits: int = 32,
) -> DataFrame:
    """→ the sparse q-digest state of integer column ``col``:
    (level, idx, cnt) nodes plus a sentinel (-1, -1, n_total). ONE
    scan; each task emits its locally-compressed digest (≤ 3k nodes),
    so the shuffle is digest-sized. Values must lie in
    [0, 2^universe_bits) — out-of-range rows FAIL the job (a quantile
    over silently clamped values is a wrong answer, not an estimate).
    Nulls are ignored (no evidence). ``k`` is the compression factor:
    rank error ≤ universe_bits · n / k."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (1 <= universe_bits <= 62):
        raise ValueError(
            f"universe_bits must be in [1, 62], got {universe_bits}"
        )
    field = df.schema[col]
    if field.dataType.simpleString() not in ("int", "bigint", "smallint", "tinyint"):
        raise ValueError(
            f"qdigest_sketch needs an integer column; {col!r} is "
            f"{field.dataType.simpleString()} — scale/cast explicitly "
            "(fixed-point for doubles, unix_micros for timestamps)"
        )
    hi = 1 << universe_bits
    out_schema = StructType(
        [
            StructField("level", IntegerType()),
            StructField("idx", LongType()),
            StructField("cnt", LongType()),
        ]
    )

    def summarize(it):
        leaves: dict[int, int] = {}
        n = 0
        for pdf in it:
            vals = pdf[col].dropna()
            if not len(vals):
                continue
            vc = vals.value_counts()
            for v, c in vc.items():
                v = int(v)
                if not (0 <= v < hi):
                    raise ValueError(
                        f"qdigest_sketch: value {v} outside "
                        f"[0, 2^{universe_bits}) — widen universe_bits "
                        "or rescale"
                    )
                leaves[v] = leaves.get(v, 0) + int(c)
                n += int(c)
        nodes = {(0, v): c for v, c in leaves.items()}
        _qd_compress(nodes, n, k, universe_bits)
        rows = [(lv, i, c) for (lv, i), c in nodes.items()]
        rows.append((_QD_SENTINEL_LEVEL, _QD_SENTINEL_LEVEL, n))
        yield pd.DataFrame(rows, columns=["level", "idx", "cnt"])

    return (
        df.select(col)
        .mapInPandas(summarize, schema=out_schema)
        .groupBy("level", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def qdigest_merge(*states: DataFrame) -> DataFrame:
    """Node-wise count addition of q-digest states (same
    universe_bits/k — the caller's contract, as with HLL lg_k and CMS
    width/depth). EXACT on the counts; per-digest rank errors ADD,
    preserving ε·N on the combined N."""
    if not states:
        raise ValueError("qdigest_merge needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("level", "idx").agg(F.sum("cnt").alias("cnt"))


class QdigestReader:
    """Driver-side view of a q-digest state: quantile and rank-bound
    queries over the collected (≤ 3k·tasks before final compression)
    node set."""

    def __init__(self, nodes: dict, n_total: int, k: int, universe_bits: int):
        self.nodes = _qd_compress(dict(nodes), n_total, k, universe_bits)
        self.n_total = n_total
        self.k = k
        self.universe_bits = universe_bits

    @property
    def rank_error_bound(self) -> int:
        """Absolute rank-error guarantee: ≤ universe_bits · ⌊n/k⌋
        (zero — exact — below the compression threshold)."""
        return self.universe_bits * (self.n_total // self.k)

    def _ordered(self):
        # q-digest query order: ascending range max, smaller ranges
        # first on ties (a contained range's values are ≤ its
        # container's max)
        out = []
        for (lv, i), c in self.nodes.items():
            lo = i << lv
            hi = ((i + 1) << lv) - 1
            out.append((hi, lv, lo, c))
        return sorted(out)

    def quantile(self, q: float) -> int:
        """The classical walk: smallest range-max whose cumulative
        count reaches ceil(q·n). True rank of the answer is within
        ``rank_error_bound`` of q·n."""
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"q must be in [0, 1], got {q}")
        if self.n_total == 0:
            raise ValueError("empty digest has no quantiles")
        target = max(1, int(np.ceil(q * self.n_total)))
        cum = 0
        last_hi = 0
        for hi, _lv, _lo, c in self._ordered():
            cum += c
            last_hi = hi
            if cum >= target:
                return hi
        return last_hi

    def rank_bounds(self, v: int) -> tuple[int, int]:
        """(lower, upper) bounds on |{x ≤ v}|: nodes entirely ≤ v
        count fully; nodes whose range straddles v are the
        uncertainty."""
        lo_sum = 0
        unsure = 0
        for (lv, i), c in self.nodes.items():
            lo = i << lv
            hi = ((i + 1) << lv) - 1
            if hi <= v:
                lo_sum += c
            elif lo <= v:
                unsure += c
        return lo_sum, lo_sum + unsure


def qdigest_collect(
    state: DataFrame, k: int = 256, universe_bits: int = 32
) -> QdigestReader:
    """Materialize a (possibly merged) q-digest state into a
    :class:`QdigestReader` — the collect is digest-sized, never
    data-sized; the final global compression happens here."""
    nodes: dict = {}
    n = 0
    for r in state.collect():
        if r["level"] == _QD_SENTINEL_LEVEL:
            n += int(r["cnt"])
            continue
        lv, i = int(r["level"]), int(r["idx"])
        if not (0 <= lv <= universe_bits and 0 <= i < (1 << (universe_bits - lv))):
            raise ValueError(
                f"q-digest node (level={lv}, idx={i}) outside "
                f"universe_bits={universe_bits} — params don't match "
                "the sketch"
            )
        nodes[(lv, i)] = nodes.get((lv, i), 0) + int(r["cnt"])
    return QdigestReader(nodes, n, k, universe_bits)


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    out_col: str = "bucket",
    k: int = 256,
    universe_bits: int = 32,
) -> DataFrame:
    """Equal-frequency bucketing WITHOUT a global sort: cut points
    come from one q-digest sketch pass (rank error ≤ the digest
    bound), the assignment is a count-of-cuts-below fold over a
    broadcast literal array — pure codegen, no shuffle, no join. →
    input columns plus ``out_col`` ∈ [0, n_buckets) (nulls → null).
    Bucket populations are balanced to within the digest's rank-error
    guarantee — the scale answer to QuantileDiscretizer-style feature
    binning and curriculum banding (operators/export.py's curriculum
    cuts solve the same problem for its own histogram; this one works
    on any integer column with no bounds known up front). On heavily
    tied data, quantile cuts can coincide; coincident cuts collapse
    (a tie cannot split across buckets), so the output may use FEWER
    than ``n_buckets`` ids — wider buckets, never misordered ones."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    reader = qdigest_collect(
        qdigest_sketch(df, col, k=k, universe_bits=universe_bits),
        k=k,
        universe_bits=universe_bits,
    )
    cuts = sorted(
        {reader.quantile(i / n_buckets) for i in range(1, n_buckets)}
    )
    # strictly-greater fold: value v lands in bucket |{cut < v}| —
    # cut c owns values ≤ c (quantile() reports a range max)
    arr = F.array(*[F.lit(int(c)) for c in cuts])
    bucket = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, c: acc + F.when(F.col(col) > c, 1).otherwise(0),
    )
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNotNull(), bucket).cast("int"),
    )


def qdigest_sink(
    spark,
    path: str,
    col: str,
    k: int = 256,
    universe_bits: int = 32,
    app_id: str = "__qd_sink__",
):
    """``foreachBatch`` function maintaining an all-time q-digest at
    ``path`` (a txn table of the sparse state): each micro-batch is
    sketched and count-added into the stored state, then re-compressed
    at the history's total n (bounding the stored state at ~3k nodes
    forever), and published with the batch id as txn seq — replays
    no-op, exactly-once under at-least-once drivers. The ε·N guarantee
    holds over the stream's WHOLE history. Read with
    :func:`read_qdigest`."""
    from etl_data_lake_spark.sources.txn import TxnTable

    tbl = TxnTable(spark, str(path))

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        fresh = qdigest_sketch(batch_df, col, k=k, universe_bits=universe_bits)
        if tbl.latest_version() > 0:
            fresh = qdigest_merge(tbl.snapshot(), fresh)
        # re-compress driver-side: the stored state stays digest-sized
        # no matter how many batches fold in
        reader = qdigest_collect(fresh, k=k, universe_bits=universe_bits)
        rows = [
            (lv, i, c) for (lv, i), c in sorted(reader.nodes.items())
        ]
        rows.append((_QD_SENTINEL_LEVEL, _QD_SENTINEL_LEVEL, reader.n_total))
        state = spark.createDataFrame(
            rows, "level int, idx long, cnt long"
        )
        tbl.overwrite(state, app_id=app_id, txn_seq=batch_id)

    return fn


def read_qdigest(
    spark, path: str, k: int = 256, universe_bits: int = 32
) -> QdigestReader:
    """The persisted streaming state as a :class:`QdigestReader`."""
    from etl_data_lake_spark.sources.txn import TxnTable

    return qdigest_collect(
        TxnTable(spark, str(path)).snapshot(),
        k=k,
        universe_bits=universe_bits,
    )


# ---------------------------------------------------------------------------
# Distinct-set OVERLAP estimation (round 10 s2) — "how many of corpus
# B's keys already exist in corpus A" without shuffling either corpus:
# the question every decontamination / snapshot-diff / crawl-dedup
# planning pass asks first. Exact answers need a join whose shuffle
# carries the smaller key set; the sketch answer is inclusion-
# exclusion over HLLs (|A∩B| = |A| + |B| − |A∪B|), built from one
# independent map-side-combined scan per side and a driver-side merge
# of two kilobyte payloads. Honesty: each term carries HLL's ~1.6%
# (lg_k=12) relative error ON ITS OWN cardinality, so the DIFFERENCE
# is accurate relative to the UNION size — a tiny overlap between two
# huge sets is estimable only in magnitude, not precisely; the
# estimate clamps at 0 and the three raw terms are returned so the
# caller can judge the error budget themselves.
# ---------------------------------------------------------------------------


def distinct_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """→ per group (or ONE global row when ``group_cols`` is empty):
    ``n_a``, ``n_b``, ``n_union``, ``n_overlap`` — HLL estimates of
    each side's distinct ``value_col`` count, their union, and the
    inclusion-exclusion overlap (clamped at 0). Groups present on one
    side only report the other side as 0. Cost: one scan per side,
    sketch-sized shuffle and driver traffic."""
    sk_a = (
        distinct_sketches(a, group_cols, value_col, "sk", lg_k)
        if group_cols
        else a.agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sk"))
    )
    sk_b = (
        distinct_sketches(b, group_cols, value_col, "sk", lg_k)
        if group_cols
        else b.agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sk"))
    )
    tagged = sk_a.withColumn("_side", F.lit("a")).unionByName(
        sk_b.withColumn("_side", F.lit("b"))
    )
    keys = [F.col(c) for c in group_cols]
    # hll_union_agg merges the ≤2 sketches per group; per-side counts
    # come from the same rows via conditional re-aggregation — union
    # NULL-skips the missing side (allowDifferentLgConfigK irrelevant:
    # both sides sketch at the caller's single lg_k)
    agg = tagged.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(F.col("_side") == "a", F.col("sk")))
        ).alias("n_a"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(F.col("_side") == "b", F.col("sk")))
        ).alias("n_b"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("n_union"),
    )
    return agg.select(
        *group_cols,
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.col("n_union"),
        F.greatest(
            F.coalesce("n_a", F.lit(0))
            + F.coalesce("n_b", F.lit(0))
            - F.col("n_union"),
            F.lit(0).cast("long"),
        ).alias("n_overlap"),
    )


def read_cms(
    spark, path: str, width: int = 2048, depth: int = 4, seed: int = 0
) -> CmsReader:
    """The persisted streaming state as a :class:`CmsReader` (params
    must match the sink's — validated cell-range-wise on collect)."""
    from etl_data_lake_spark.sources.txn import TxnTable

    return cms_collect(
        TxnTable(spark, str(path)).snapshot(),
        width=width,
        depth=depth,
        seed=seed,
    )
