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
