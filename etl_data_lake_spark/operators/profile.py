"""One-pass table profiling — the "what did I just ingest" step of a
training-data pipeline (row/null/distinct counts, ranges, means) plus
a fixed-width numeric histogram, each a single aggregation job whose
shuffle carries aggregate rows only.

Every statistic is chosen to be computable in ONE map-side-combined
pass at 100 TB:

* counts / nulls / min / max / mean — classic partial aggregates;
* distinct counts are HyperLogLog++ (``approx_count_distinct``) —
  exact distinct would shuffle the corpus;
* the histogram is fixed-width ``width_bucket`` over caller-supplied
  [lo, hi] (one groupBy over ≤ bins+2 keys), NOT a sampled
  equi-height sketch — fixed bounds keep it SQL-reproducible and
  mergeable across partitions/days by plain addition.

The profile emits LONG format (one row per column) so a 2000-column
table profiles into 2000 rows, not a 2000-field struct the driver
must schema-print; everything stays a lazy DataFrame plan (the
single-row wide aggregate is unpivoted with ``stack`` in the same
job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _qcol(name: str):
    """Backtick-quoted column reference: ingested tables routinely
    carry dots (flattened JSON) in column names, which a bare
    ``F.col`` would parse as struct-field access."""
    return F.col("`" + name.replace("`", "``") + "`")


def profile(df: DataFrame, cols: tuple[str, ...] | None = None) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls,
    approx_distinct, min_str, max_str, mean)`` — min/max render as
    strings so heterogeneous columns share one schema; ``mean`` is
    null for non-numeric columns. ONE aggregation job for the whole
    list."""
    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("no columns to profile")
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in names:
        col = _qcol(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"),
            F.approx_count_distinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
            (
                F.avg(col) if c in numeric else F.lit(None).cast("double")
            ).alias(f"__mean_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single aggregate row: stack(n, name1, v1..., ...)
    stack_args = []
    for c in names:
        stack_args += [
            F.lit(c),
            _qcol(f"__nulls_{c}"),
            _qcol(f"__dist_{c}"),
            _qcol(f"__min_{c}"),
            _qcol(f"__max_{c}"),
            _qcol(f"__mean_{c}"),
        ]
    return wide.select(
        F.stack(
            F.lit(len(names)),
            *stack_args,
        ).alias("column", "n_nulls", "approx_distinct", "min_str",
                "max_str", "mean"),
        F.col("__rows").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_nulls", "approx_distinct",
        "min_str", "max_str", "mean",
    )


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Fixed-width histogram of ``col`` over [lo, hi]: ``(bucket,
    bucket_lo, bucket_hi, n)`` with bucket 0 = underflow and
    ``bins + 1`` = overflow (width_bucket's convention); nulls AND
    NaNs are dropped (width_bucket maps NaN to a null bucket, which
    would break the fixed 0..bins+1 key contract day-over-day sums
    rely on). One groupBy over ≤ bins+2 keys — at any corpus size the
    shuffle moves at most bins+2 rows per task. Fixed caller bounds
    (vs a sampled sketch) make day-over-day histograms addable and
    the whole thing reproducible in ANSI SQL."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    d = _qcol(col).cast("double")
    b = F.width_bucket(d, F.lit(lo), F.lit(hi), F.lit(bins))
    return (
        df.where(d.isNotNull() & ~F.isnan(d))
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            # underflow/overflow get open-ended bounds
            F.when(F.col("bucket") > 0, (F.col("bucket") - 1) * width + lo)
            .alias("bucket_lo"),
            F.when(F.col("bucket") <= bins, F.col("bucket") * width + lo)
            .alias("bucket_hi"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Histogram algebra (round 9) — the quantile half of the mergeable-
# sketch story (HLL covers distinct counts, Misra–Gries covers
# frequency): fixed-width histograms with shared caller bounds ADD,
# so a fleet can histogram each partition/day/table once, persist the
# ≤ bins+2 rows, and answer quantiles over any union by merging rows
# — no rescan, no sampled sketch whose merge drifts. The price is an
# explicit, reported error: a quantile is located within its bucket,
# so the answer is exact to ± one bucket width (vs t-digest's
# data-dependent and merge-order-dependent error).
# ---------------------------------------------------------------------------


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Add fixed-width histograms produced by :func:`numeric_histogram`
    WITH THE SAME (bins, lo, hi): union + one ≤ bins+2-key group-by.
    Histograms built at different parameters don't share bucket
    bounds; their rows stay distinct and
    :func:`histogram_quantiles` rejects the result loudly."""
    if not hists:
        raise ValueError("merge_histograms needs at least one histogram")
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), hists)
    return u.groupBy("bucket", "bucket_lo", "bucket_hi").agg(
        F.sum("n").alias("n")
    )


def histogram_quantiles(
    hist: DataFrame, qs: list[float]
) -> list[float]:
    """Quantile estimates from a (merged) fixed-width histogram:
    linear interpolation within the located bucket — error ≤ one
    bucket width for mass inside [lo, hi]; mass in the open-ended
    under/overflow buckets clamps to the finite edge (lo / hi), where
    the histogram genuinely carries no position information. The
    histogram frame is ≤ bins+2 rows by construction; this collects
    it and walks on the driver."""
    if not qs:
        return []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    rows = sorted(hist.collect(), key=lambda r: r["bucket"])
    if not rows:
        raise ValueError("empty histogram — no quantiles to locate")
    seen_buckets = [r["bucket"] for r in rows]
    if len(set(seen_buckets)) != len(seen_buckets):
        raise ValueError(
            "duplicate bucket ids with different bounds — these "
            "histograms were built at different (bins, lo, hi) and "
            "cannot be merged"
        )
    total = sum(r["n"] for r in rows)
    if total == 0:
        raise ValueError("empty histogram — no quantiles to locate")
    out = []
    for q in qs:
        target = q * total
        cum = 0
        val = None
        for r in rows:
            if cum + r["n"] >= target and r["n"] > 0:
                lo_b, hi_b = r["bucket_lo"], r["bucket_hi"]
                if lo_b is None:        # underflow: clamp to lo
                    val = hi_b
                elif hi_b is None:      # overflow: clamp to hi
                    val = lo_b
                else:
                    frac = (target - cum) / r["n"]
                    val = lo_b + (hi_b - lo_b) * min(max(frac, 0.0), 1.0)
                break
            cum += r["n"]
        if val is None:  # q == 1.0 boundary: last non-empty bucket
            last = [r for r in rows if r["n"] > 0][-1]
            val = last["bucket_lo"] if last["bucket_hi"] is None else last["bucket_hi"]
        out.append(float(val))
    return out


# ---------------------------------------------------------------------------
# Distribution drift (round 10 s2) — the Population Stability Index,
# the standard deployed-model / corpus-refresh drift metric:
# PSI = Σ_buckets (p_b − q_b)·ln(p_b/q_b) over a SHARED fixed-width
# binning, where p is the reference snapshot's bucket rate and q the
# candidate's. Conventional reading: < 0.1 stable, 0.1-0.25 moderate
# shift, > 0.25 investigate. Each side costs one numeric_histogram
# scan (≤ bins+2 shuffled rows at any corpus size); the report joins
# two ≤ bins+2-row frames — drift over 100 TB snapshots is two
# histogram scans, full stop. Rates clamp at ``min_rate`` (the
# conventional PSI smoothing) so an empty bucket on one side
# contributes a large-but-finite term instead of ±inf.
# ---------------------------------------------------------------------------


def drift_report(
    reference: DataFrame,
    candidate: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
    min_rate: float = 1e-4,
) -> DataFrame:
    """→ one row per bucket (incl. under/overflow): (bucket,
    bucket_lo, bucket_hi, n_ref, n_cand, rate_ref, rate_cand, psi) —
    ``psi`` is the bucket's contribution; sum it (or call
    :func:`population_stability_index`) for the index. Raises on an
    empty side: drift against nothing is a configuration error, not
    zero drift."""
    return drift_report_from_histograms(
        numeric_histogram(reference, col, bins, lo, hi),
        numeric_histogram(candidate, col, bins, lo, hi),
        min_rate=min_rate,
    )


def drift_report_from_histograms(
    h_ref: DataFrame,
    h_cand: DataFrame,
    min_rate: float = 1e-4,
) -> DataFrame:
    """The histogram-level core of :func:`drift_report`, for summaries
    that already exist — a persisted reference profile, a streaming
    :func:`histogram_sink` state — so drift costs the ≤ bins+2-row
    join alone, zero data scans. Both histograms must share
    (bins, lo, hi); rows from mismatched parameters don't align and
    the full join would double the bucket count — callers own that
    contract exactly as with :func:`merge_histograms`."""
    if not (0.0 < min_rate < 1.0):
        raise ValueError(f"min_rate must be in (0, 1), got {min_rate}")
    # join on bucket ID ALONE: under shared (bins, lo, hi) the id
    # determines the bounds, and the under/overflow rows carry NULL
    # open-ended bounds — a join keyed on the bounds would never match
    # them (SQL null equality), silently splitting each side's
    # out-of-range mass into two phantom buckets and inflating PSI
    r = h_ref.select(
        "bucket",
        F.col("bucket_lo").alias("_rlo"),
        F.col("bucket_hi").alias("_rhi"),
        F.col("n").alias("n_ref"),
    )
    c = h_cand.select(
        "bucket",
        F.col("bucket_lo").alias("_clo"),
        F.col("bucket_hi").alias("_chi"),
        F.col("n").alias("n_cand"),
    )
    joined = r.join(c, ["bucket"], "full").select(
        "bucket",
        F.coalesce("_rlo", "_clo").alias("bucket_lo"),
        F.coalesce("_rhi", "_chi").alias("bucket_hi"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # ≤ bins+2 rows: a global window is free
    tot_ref = F.sum("n_ref").over(w)
    tot_cand = F.sum("n_cand").over(w)
    # try_divide: a zero total must reach the raise_error guard below,
    # not die in ANSI division first
    with_rates = joined.select(
        "*",
        F.greatest(
            F.try_divide(F.col("n_ref"), tot_ref), F.lit(min_rate)
        ).alias("rate_ref"),
        F.greatest(
            F.try_divide(F.col("n_cand"), tot_cand), F.lit(min_rate)
        ).alias("rate_cand"),
        tot_ref.alias("_tr"),
        tot_cand.alias("_tc"),
    )
    checked = with_rates.select(
        "bucket",
        "bucket_lo",
        "bucket_hi",
        "n_ref",
        "n_cand",
        "rate_ref",
        "rate_cand",
        F.when(
            (F.col("_tr") > 0) & (F.col("_tc") > 0),
            (F.col("rate_cand") - F.col("rate_ref"))
            * F.log(F.col("rate_cand") / F.col("rate_ref")),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "drift_report: one side has no rows in-range — "
                    "drift against nothing is a configuration error"
                )
            )
        )
        .alias("psi"),
    )
    return checked


def population_stability_index(report: DataFrame) -> float:
    """Collapse a :func:`drift_report` to the scalar PSI (the frame is
    ≤ bins+2 rows; the collect is free)."""
    row = report.agg(F.sum("psi").alias("psi")).collect()[0]
    return float(row["psi"])


def histogram_sink(
    spark,
    path: str,
    col: str,
    bins: int,
    lo: float,
    hi: float,
    app_id: str = "__hist_sink__",
):
    """``foreachBatch`` function maintaining an all-time fixed-width
    histogram at ``path`` (a txn table): each micro-batch is
    histogrammed (≤ bins+2 shuffled rows) and COUNT-ADDED into the
    stored state — histogram merge is exact, so the maintained state
    IS the from-scratch histogram of the whole history — published
    with the batch id as txn seq (replays no-op; exactly-once under
    at-least-once drivers). The streaming member of the histogram
    algebra: read the state with :func:`read_histogram` and feed it
    to :func:`histogram_quantiles` or — the monitoring loop —
    :func:`drift_report_from_histograms` against a persisted
    reference profile, giving continuously-fresh PSI whose refresh
    cost is the micro-batch, never the history."""
    from etl_data_lake_spark.sources.txn import TxnTable

    tbl = TxnTable(spark, str(path))

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        fresh = numeric_histogram(batch_df, col, bins, lo, hi)
        if tbl.latest_version() > 0:
            fresh = merge_histograms(tbl.snapshot(), fresh)
        tbl.overwrite(fresh, app_id=app_id, txn_seq=batch_id)

    return fn


def read_histogram(spark, path: str) -> DataFrame:
    """The persisted streaming histogram state, in
    :func:`numeric_histogram`'s row contract."""
    from etl_data_lake_spark.sources.txn import TxnTable

    return TxnTable(spark, str(path)).snapshot()
