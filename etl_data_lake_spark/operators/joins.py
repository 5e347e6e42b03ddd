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

_TIME_TYPES = ("timestamp", "timestamp_ntz", "date")


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


def _is_time_type(dtype: str) -> bool:
    return dtype.split("(")[0] in _TIME_TYPES


def _to_micros(col: Column) -> Column:
    """Epoch-micros LONG for binning time types. Both sides go through
    one cast chain (tz interpretation is irrelevant: both convert
    identically and only bin ALIGNMENT matters — the exact predicate
    compares the original columns). Integer micros make the
    end-exclusive bin ``floor((e-1)/w)`` exact."""
    return F.unix_micros(col.cast("timestamp"))


# Numeric binning operates on the raw value (``bin_width`` in plain
# units) via double division — NO ×1e6 long cast, which silently
# wrapped for |v| > ~9.2e12 and collapsed sub-microsecond fractional
# differences (two values straddling a bin boundary by < 1e-6 could
# land in the "wrong" bin and a qualifying pair never met). IEEE
# division by a fixed positive divisor is monotone, so for any
# s <= v < e: floor(s/w) <= floor(v/w) <= floor(e/w) — binning the
# interval as [floor(s/w), floor(e/w)] can over-cover by one bin (when
# e sits exactly on a boundary) but can never MISS a qualifying pair;
# the exact predicate filters the slack. The magnitude guard below
# keeps floor()'s double→long conversion exact-enough on the interval
# side, which (by the same monotonicity) is sufficient for every
# qualifying point too.
_NUM_BIN_LIMIT = float(2**62)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bin_width: float = 3600.0,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= ts < end`` (plus optional equi-keys ``on``) — WITHOUT
    the BroadcastNestedLoopJoin Spark plans for a bare range predicate.

    Spark has no range-join optimization (Databricks' range-join hint
    is proprietary): ``p JOIN i ON i.s <= p.ts AND p.ts < i.e`` becomes
    a nested-loop over every pair — quadratic, and the canonical
    100 TB cliff for sessionization/attribution workloads. The public
    rewrite (used by every range-join implementation in the open
    literature, e.g. Flink's interval join and the bucketing trick in
    Spark's own SPARK-8682 discussion) turns it into an EQUI-join:

    * each point belongs to exactly ONE fixed-width time bin;
    * each interval explodes into the bins it covers
      (``sequence(floor(s/W), floor((e-1µs)/W))``);
    * join on ``on + [bin]`` — each qualifying (interval, point) pair
      meets exactly once (the point's single bin), so no dedup pass —
    * then the EXACT predicate filters within the bin matches.

    Cost model: the shuffle carries ``|points| + Σ ceil(span/W)``
    rows instead of an |points|×|intervals| loop; ``bin_width``
    (seconds for time columns, plain units for numerics) trades
    interval replication against per-bin match width. Intervals
    longer than ``max_bins_per_interval`` bins raise AT RUNTIME inside
    the job (lazy ``raise_error`` branch — no extra driver action):
    a mis-sized bin width should fail loudly, not silently explode a
    1-year interval into 8 million rows.

    Empty (``end <= start``) and null-bounded intervals match nothing,
    null timestamps match nothing (SQL semantics). Column names must
    be disjoint apart from ``on`` — collide-and-rename is the
    caller's job, silently aliasing is how joins corrupt lineage.

    STREAMING: works unchanged with a streaming ``points`` side —
    every points-side stage is a stateless projection and the
    exploded intervals are a static build side, so the whole plan is
    a stream-static inner join (no watermark needed); batch ≡ stream
    pinned in tests.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    if max_bins_per_interval < 1:
        raise ValueError(
            f"max_bins_per_interval must be >= 1, got {max_bins_per_interval}"
        )
    on = list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"column names collide outside the join keys: {sorted(overlap)} "
            "— rename before joining"
        )
    if "__bin" in points.columns or "__bin" in intervals.columns:
        raise ValueError(
            "'__bin' is reserved by interval_join — rename the column"
        )
    p_dt = dict(points.dtypes)[point_ts]
    s_dt = dict(intervals.dtypes)[start_col]
    e_dt = dict(intervals.dtypes)[end_col]
    time_side = _is_time_type(p_dt)
    if not (time_side == _is_time_type(s_dt) == _is_time_type(e_dt)):
        raise TypeError(
            f"interval_join: mixed time/numeric column types "
            f"({point_ts}:{p_dt}, {start_col}:{s_dt}, {end_col}:{e_dt}) "
            "— cast one side before joining"
        )

    if time_side:
        w_micros = int(bin_width * 1_000_000)
        if w_micros < 1:
            raise ValueError(
                f"bin_width {bin_width}s is below 1µs, the resolution of "
                "Spark timestamps"
            )
        point_bin = F.floor(_to_micros(F.col(point_ts)) / w_micros)
        s_m = _to_micros(F.col(start_col))
        e_m = _to_micros(F.col(end_col))
        start_bin = F.floor(s_m / w_micros)
        end_bin = F.floor((e_m - 1) / w_micros)  # end exclusive, exact int math
    else:
        w_lit = F.lit(float(bin_width))
        point_bin = F.floor(F.col(point_ts).cast("double") / w_lit)
        s_q = F.col(start_col).cast("double") / w_lit
        e_q = F.col(end_col).cast("double") / w_lit
        # In-plan magnitude guard (intervals side only — by monotonicity
        # of division, any point INSIDE a checked interval is in range
        # too; an out-of-range stray point can only produce false
        # candidates, which the exact predicate removes).
        in_range = (F.abs(s_q) < _NUM_BIN_LIMIT) & (F.abs(e_q) < _NUM_BIN_LIMIT)
        start_bin = F.when(in_range, F.floor(s_q)).otherwise(
            F.raise_error(
                F.format_string(
                    "interval_join: |bound / bin_width| exceeds 2^62 for "
                    "interval [%s, %s) — raise bin_width to keep bin ids "
                    "exact",
                    F.col(start_col).cast("string"),
                    F.col(end_col).cast("string"),
                )
            )
        )
        # floor(e/w), not floor((e-1µs)/w): over-covers by at most one
        # bin when e sits on a boundary, never misses (see module note).
        end_bin = F.floor(e_q)

    p = points.withColumn("__bin", point_bin).where(F.col("__bin").isNotNull())

    n_bins = end_bin - start_bin + 1
    checked_end = F.when(n_bins <= max_bins_per_interval, end_bin).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: an interval spans %s bins, over "
                f"max_bins_per_interval={max_bins_per_interval} — raise "
                "bin_width or split the interval",
                n_bins,
            )
        )
    )
    iv = (
        intervals.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) > F.col(start_col))
        )
        .withColumn("__bin", F.explode(F.sequence(start_bin, checked_end)))
    )
    joined = p.join(iv, on=on + ["__bin"], how="inner").where(
        (F.col(start_col) <= F.col(point_ts))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__bin")


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bin_width: float = 3600.0,
    max_span: float = 86400.0,
    points_watermark: str = "1 hour",
    intervals_watermark: str = "1 hour",
    max_bins_per_interval: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM form of :func:`interval_join`: both ``points``
    and ``intervals`` may be streaming frames; each point joins
    every interval with ``start <= ts < end`` (plus optional
    equi-keys), with state evicted by watermarks.

    ``how="left_outer"`` keeps UNMATCHED points with null interval
    columns — the "events with no attributable campaign" shape. A
    point has exactly one bin, so the outer row is emitted once. In
    streaming, Spark emits an outer null row only once the watermark
    proves no future interval can match it (the standard outer
    stream-stream semantics: results for unmatched rows trail by the
    watermark delay); in batch it behaves like any left join. Points
    with a NULL timestamp are dropped in either mode — they can never
    match and carry no event time for the watermark to reason about.

    The same bin rewrite does double duty here. In batch it kills the
    BroadcastNestedLoopJoin; in streaming it gives the
    StreamingSymmetricHashJoin a REAL equality key — without it, a
    pure range predicate would pile both sides' state under one hash
    key and compare every stored row against every arrival. With it,
    state distributes by (on + bin) and each arrival probes exactly
    its own bin's bucket.

    Eviction needs the join condition to bound event time in BOTH
    directions (Spark derives state TTLs from it):

    * ``s <= ts`` already bounds the intervals side (a stored point
      is unmatchable once the intervals watermark passes its ts);
    * ``ts <= s + max_span`` bounds the points side (a stored
      interval is unmatchable once the points watermark passes
      s + max_span).

    ``max_span`` is therefore a DECLARED upper bound on interval
    length (end − start), not a heuristic: an interval longer than it
    could match points the eviction bound already excluded, so such
    intervals RAISE in-plan (the operator's loud-failure rule) rather
    than silently losing matches. Late rows beyond the watermarks are
    dropped by Spark's join-state semantics — the standard
    stream-stream trade.

    Works unchanged on batch frames (``withWatermark`` is a no-op in
    batch) — the batch ≡ stream equality test runs the SAME call both
    ways. Time-typed columns only: watermarks are event-time
    machinery, so the numeric path has no streaming form.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    if max_span <= 0:
        raise ValueError(f"max_span must be > 0, got {max_span}")
    if max_bins_per_interval < 1:
        raise ValueError(
            f"max_bins_per_interval must be >= 1, got {max_bins_per_interval}"
        )
    on = list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"column names collide outside the join keys: {sorted(overlap)} "
            "— rename before joining"
        )
    for c in ("__pbin", "__ibin"):
        if c in points.columns or c in intervals.columns:
            raise ValueError(f"{c!r} is reserved by interval_join_stream")
    dts = dict(points.dtypes)[point_ts]
    s_dt = dict(intervals.dtypes)[start_col]
    e_dt = dict(intervals.dtypes)[end_col]
    if not (_is_time_type(dts) and _is_time_type(s_dt) and _is_time_type(e_dt)):
        raise TypeError(
            "interval_join_stream needs time-typed columns (watermarks "
            f"are event-time machinery); got {point_ts}:{dts}, "
            f"{start_col}:{s_dt}, {end_col}:{e_dt}"
        )
    w_micros = int(bin_width * 1_000_000)
    if w_micros < 1:
        raise ValueError(
            f"bin_width {bin_width}s is below 1µs, the resolution of "
            "Spark timestamps"
        )
    span_micros = int(max_span * 1_000_000)

    p = points.withWatermark(point_ts, points_watermark).withColumn(
        "__pbin", F.floor(_to_micros(F.col(point_ts)) / w_micros)
    ).where(F.col("__pbin").isNotNull())

    s_m = _to_micros(F.col(start_col))
    e_m = _to_micros(F.col(end_col))
    start_bin = F.floor(s_m / w_micros)
    end_bin = F.floor((e_m - 1) / w_micros)
    n_bins = end_bin - start_bin + 1
    checked_end = (
        F.when(
            e_m - s_m > span_micros,
            F.raise_error(
                F.format_string(
                    "interval_join_stream: an interval spans %s seconds, "
                    f"over max_span={max_span} — matches beyond the "
                    "eviction bound would be silently lost; raise "
                    "max_span or split the interval",
                    ((e_m - s_m) / 1_000_000).cast("string"),
                )
            ),
        )
        .when(
            n_bins > max_bins_per_interval,
            F.raise_error(
                F.format_string(
                    "interval_join_stream: an interval spans %s bins, over "
                    f"max_bins_per_interval={max_bins_per_interval} — "
                    "raise bin_width or split the interval",
                    n_bins,
                )
            ),
        )
        .otherwise(end_bin)
    )
    iv = (
        intervals.withWatermark(start_col, intervals_watermark)
        .where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) > F.col(start_col))
        )
        .withColumn("__ibin", F.explode(F.sequence(start_bin, checked_end)))
    )
    span_interval = F.expr(f"INTERVAL {span_micros} MICROSECONDS")
    cond = (p["__pbin"] == iv["__ibin"])
    for k in on:
        cond = cond & (p[k] == iv[k])
    cond = (
        cond
        & (iv[start_col] <= p[point_ts])
        & (p[point_ts] < iv[end_col])
        # redundant given the span guard, but this is the bound Spark
        # reads to evict interval state — keep it IN the condition
        & (p[point_ts] <= iv[start_col] + span_interval)
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}"
        )
    joined = p.join(iv, cond, how)
    out = joined.drop(p["__pbin"]).drop(iv["__ibin"])
    for k in on:
        out = out.drop(iv[k])
    return out
