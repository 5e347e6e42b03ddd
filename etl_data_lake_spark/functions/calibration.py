"""Classifier calibration — reliability bins, ECE/Brier, and
temperature / Platt scaling — extending classifier_eval's
one-aggregation design (functions/classifier.py): scores that feed
``quality_filter`` thresholds should be CALIBRATED probabilities, or
the threshold does not mean what the operator thinks it means.

Every entry point keeps the discipline the eval twin established:

* exactly ONE data-sized aggregation per call — a (bucket)-keyed
  group-by whose output is ≤ ``bins`` rows; everything downstream
  (window totals, the Newton fit) runs over those aggregate rows,
  never over data rows;
* the fit itself (:func:`fit_temperature` / :func:`fit_platt`) is a
  driver-side Newton loop over the collected per-bucket sufficient
  statistics (z̄_b, pos_b, neg_b) — O(bins·iters) float64 work,
  deterministic (fixed bucket order, fixed iteration count bound),
  zero further Spark jobs. This is "in-plan" the same way the BPE
  merge loop is: the distributed step is one histogram, the
  optimization runs over it;
* applying a fitted calibration (:func:`calibrate_scores`) is a pure
  column expression (sigmoid of an affine logit) — codegen, no UDF.

Approximation contract: the fit sees each bucket's MEAN logit instead
of each row's logit, so the fitted parameters deviate from the exact
max-likelihood fit by at most the within-bucket logit spread — at the
default 10k buckets over prob space this is far below the parameter
noise floor (pinned by recovery tests in tests/test_calibration.py:
synthetic data generated at a known temperature/affine recovers it).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PlattModel:
    """Calibrated probability = sigmoid(a·z + b) over the raw logit z.
    ``temperature_only`` fits b = 0 with a = 1/T (Guo et al.'s
    temperature scaling); the full Platt fit learns both."""

    a: float
    b: float = 0.0

    @property
    def temperature(self) -> float:
        return 1.0 / self.a if self.a else float("inf")


def _logit_col(score_col: str | None, logit_col: str | None):
    """The raw logit column: given directly, or derived from a
    probability column (clamped away from {0,1} so the logit stays
    finite — the standard epsilon guard)."""
    if (score_col is None) == (logit_col is None):
        raise ValueError("pass exactly one of score_col / logit_col")
    if logit_col is not None:
        return F.col(logit_col).cast("double")
    p = F.col(score_col).cast("double")
    eps = 1e-12
    p = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
    return F.log(p / (F.lit(1.0) - p))


def _bucket_stats(
    scored: DataFrame,
    label_col: str,
    score_col: str | None,
    logit_col: str | None,
    bins: int,
) -> list:
    """The one data-sized aggregation: per prob-space bucket, the
    summed logit and the class counts — the sufficient statistics for
    any sigmoid-affine fit. NaN/null labels and scores are excluded
    (classifier_eval's rule: no evidence, not wrong evidence)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    z = _logit_col(score_col, logit_col)
    y = F.col(label_col).cast("double")
    rows = scored.where(
        y.isNotNull() & z.isNotNull() & ~F.isnan(y) & ~F.isnan(z)
    ).select(y.cast("long").alias("_y"), z.alias("_z"))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z")))
    bucket = F.least(
        F.floor(prob * F.lit(bins)).cast("long"), F.lit(bins - 1)
    )
    stats = (
        rows.groupBy(bucket.alias("_b"))
        .agg(
            F.sum("_z").alias("_sz"),
            F.sum("_y").alias("_p"),
            F.sum(F.lit(1) - F.col("_y")).alias("_q"),
        )
        .orderBy("_b")
        .collect()
    )
    return [
        (r["_sz"] / (r["_p"] + r["_q"]), float(r["_p"]), float(r["_q"]))
        for r in stats
    ]


def _newton_fit(
    pts: list, fit_intercept: bool, iters: int = 50, tol: float = 1e-12
) -> PlattModel:
    """Newton–Raphson on the weighted logistic log-loss over the
    bucket points [(z̄, n_pos, n_neg)]. Concave problem, 1 or 2
    params; deterministic float64, fixed point order."""
    a, b = 1.0, 0.0
    for _ in range(iters):
        g_a = g_b = h_aa = h_ab = h_bb = 0.0
        for z, np_, nq in pts:
            t = a * z + b
            # stable sigmoid
            if t >= 0:
                e = math.exp(-t)
                p = 1.0 / (1.0 + e)
            else:
                e = math.exp(t)
                p = e / (1.0 + e)
            n = np_ + nq
            d = n * p - np_  # dLoss/dt summed over the bucket
            w = n * p * (1.0 - p)
            g_a += d * z
            g_b += d
            h_aa += w * z * z
            h_ab += w * z
            h_bb += w
        if fit_intercept:
            det = h_aa * h_bb - h_ab * h_ab
            if det <= 0:
                break  # degenerate (e.g. all z equal): keep current
            da = (h_bb * g_a - h_ab * g_b) / det
            db = (h_aa * g_b - h_ab * g_a) / det
        else:
            if h_aa <= 0:
                break
            da, db = g_a / h_aa, 0.0
        a -= da
        b -= db
        if abs(da) < tol and abs(db) < tol:
            break
    return PlattModel(a=a, b=b if fit_intercept else 0.0)


def fit_temperature(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str | None = "prob",
    logit_col: str | None = None,
    bins: int = 10_000,
) -> PlattModel:
    """Temperature scaling: calibrated p = sigmoid(z / T), the
    one-parameter fit that preserves the ranking (and therefore AUC)
    exactly. Returns PlattModel(a=1/T, b=0)."""
    pts = _bucket_stats(scored, label_col, score_col, logit_col, bins)
    if not pts:
        return PlattModel(a=1.0, b=0.0)
    return _newton_fit(pts, fit_intercept=False)


def fit_platt(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str | None = "prob",
    logit_col: str | None = None,
    bins: int = 10_000,
) -> PlattModel:
    """Platt scaling: calibrated p = sigmoid(a·z + b) — the affine
    logit fit, correcting both over/under-confidence (a) and base-rate
    shift (b)."""
    pts = _bucket_stats(scored, label_col, score_col, logit_col, bins)
    if not pts:
        return PlattModel(a=1.0, b=0.0)
    return _newton_fit(pts, fit_intercept=True)


def calibrate_scores(
    df: DataFrame,
    model: PlattModel,
    score_col: str | None = "prob",
    logit_col: str | None = None,
    out_col: str = "prob_calibrated",
) -> DataFrame:
    """Apply a fitted calibration as a pure column expression —
    sigmoid(a·z + b), whole-stage codegen, no UDF."""
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    z = _logit_col(score_col, logit_col)
    t = F.lit(model.a) * z + F.lit(model.b)
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-t))
    )


@dataclass(frozen=True)
class IsotonicModel:
    """Non-parametric step calibrator: probability space is cut into
    ``bins`` equal-width buckets and every bucket carries the fitted
    (monotone, pooled) positive rate of its PAV block. ``values[b]``
    is the calibrated probability for bucket ``b``; empty buckets
    inherit the nearest fitted block at-or-below (step
    interpolation), so the map is TOTAL over [0, 1]."""

    bins: int
    values: tuple[float, ...]


def _pav(points: list[tuple[float, float]]) -> list[float]:
    """Weighted pool-adjacent-violators over ``(weight, rate)`` points
    in order: the classic stack merge — O(n), deterministic float64.
    Returns the non-decreasing fitted rate per input point."""
    # stack of blocks: [start_index, weight_sum, rate_weighted_sum]
    stack: list[list[float]] = []
    for i, (w, y) in enumerate(points):
        stack.append([i, w, w * y])
        while len(stack) >= 2 and (
            stack[-2][2] / stack[-2][1] >= stack[-1][2] / stack[-1][1]
        ):
            top = stack.pop()
            stack[-1][1] += top[1]
            stack[-1][2] += top[2]
    out = [0.0] * len(points)
    bounds = [int(b[0]) for b in stack] + [len(points)]
    for bi, blk in enumerate(stack):
        v = blk[2] / blk[1]
        for i in range(bounds[bi], bounds[bi + 1]):
            out[i] = v
    return out


def fit_isotonic(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str = "prob",
    bins: int = 1000,
) -> IsotonicModel:
    """Isotonic-regression calibration (Zadrozny & Elkan 2002) — the
    non-parametric member of the family: no sigmoid shape assumption,
    just the best monotone step function, which is what you want when
    the reliability curve is S-bent in a way temperature/Platt cannot
    express. Same scale discipline as the parametric fits: ONE
    data-sized bucket aggregation (≤ ``bins`` rows), then the PAV
    merge on the driver over those rows.

    Approximation contract: exact isotonic regression pools over
    individual rows; this pools over ``bins`` equal-width buckets —
    the fitted curve differs from row-exact PAV by at most the
    within-bucket score spread, and rates over each bucket are exact
    (the bucket aggregation loses no counts)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    rows = scored.where(
        y.isNotNull() & s.isNotNull() & ~F.isnan(y) & ~F.isnan(s)
    ).select(y.cast("long").alias("_y"), s.alias("_s"))
    bucket = F.greatest(
        F.least(F.floor(F.col("_s") * F.lit(bins)).cast("long"),
                F.lit(bins - 1)),
        F.lit(0),
    )
    stats = (
        rows.groupBy(bucket.alias("_b"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_y").alias("_p"),
        )
        .orderBy("_b")
        .collect()
    )
    if not stats:
        # no evidence: the identity-ish step map (bucket midpoints)
        vals = tuple((b + 0.5) / bins for b in range(bins))
        return IsotonicModel(bins=bins, values=vals)
    pts = [(float(r["_n"]), r["_p"] / r["_n"]) for r in stats]
    fitted = _pav(pts)
    # total map: empty buckets take the nearest fitted value at-or-
    # below (step interpolation); below the first observed bucket,
    # the first block's value
    values = [0.0] * bins
    obs = {int(r["_b"]): fitted[i] for i, r in enumerate(stats)}
    cur = fitted[0]
    for b in range(bins):
        cur = obs.get(b, cur)
        values[b] = cur
    return IsotonicModel(bins=bins, values=tuple(values))


def isotonic_calibrate(
    df: DataFrame,
    model: IsotonicModel,
    score_col: str = "prob",
    out_col: str = "prob_calibrated",
) -> DataFrame:
    """Apply an isotonic fit: bucket the score and BROADCAST-join the
    ≤ ``bins``-row bucket→value map — no UDF, no ``bins``-literal
    expression tree (a 10k-element literal array would bloat codegen;
    a broadcast hash join of a tiny frame is the Spark-shaped way).
    Null/NaN scores calibrate to null."""
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    if "__iso_b" in df.columns:
        raise ValueError("input already has reserved column '__iso_b'")
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        [(b, float(v)) for b, v in enumerate(model.values)],
        f"__iso_b long, {out_col} double",
    )
    s = F.col(score_col).cast("double")
    bucket = F.when(
        s.isNotNull() & ~F.isnan(s),
        F.greatest(
            F.least(
                F.floor(s * F.lit(model.bins)).cast("long"),
                F.lit(model.bins - 1),
            ),
            F.lit(0),
        ),
    )
    return (
        df.withColumn("__iso_b", bucket)
        .join(F.broadcast(mapping), "__iso_b", "left")
        .drop("__iso_b")
    )


def fit_isotonic_by(
    scored: DataFrame,
    group_col: str,
    label_col: str = "y",
    score_col: str = "prob",
    bins: int = 1000,
) -> dict:
    """Per-group isotonic fits (e.g. one calibrator per corpus
    source — a classifier miscalibrates DIFFERENTLY on web text vs
    code, and a global fit averages the two errors): ONE
    (group, bucket)-keyed aggregation — ≤ |groups|·bins rows, the
    family's scale contract — then an independent PAV per group on
    the driver. → {group_value: IsotonicModel}; null-group rows are
    excluded like null labels (no group, no evidence). Apply with
    :func:`isotonic_calibrate_by`."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    g = F.col(group_col)
    rows = scored.where(
        y.isNotNull() & s.isNotNull() & ~F.isnan(y) & ~F.isnan(s)
        & g.isNotNull()
    ).select(
        g.alias("_g"), y.cast("long").alias("_y"), s.alias("_s")
    )
    bucket = F.greatest(
        F.least(F.floor(F.col("_s") * F.lit(bins)).cast("long"),
                F.lit(bins - 1)),
        F.lit(0),
    )
    stats = (
        rows.groupBy("_g", bucket.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_p"))
        .orderBy("_g", "_b")
        .collect()
    )
    by_group: dict = {}
    for r in stats:
        by_group.setdefault(r["_g"], []).append(r)
    out = {}
    for gval, grows in by_group.items():
        pts = [(float(r["_n"]), r["_p"] / r["_n"]) for r in grows]
        fitted = _pav(pts)
        obs = {int(r["_b"]): fitted[i] for i, r in enumerate(grows)}
        values = [0.0] * bins
        cur = fitted[0]
        for b in range(bins):
            cur = obs.get(b, cur)
            values[b] = cur
        out[gval] = IsotonicModel(bins=bins, values=tuple(values))
    return out


def isotonic_calibrate_by(
    df: DataFrame,
    models: dict,
    group_col: str,
    score_col: str = "prob",
    out_col: str = "prob_calibrated",
) -> DataFrame:
    """Apply per-group isotonic fits: one broadcast join on
    (group, bucket) against the union of the groups' bucket maps
    (≤ |groups|·bins rows). Rows whose group has no fitted model —
    or whose score is null/NaN — calibrate to null rather than
    borrowing another group's curve."""
    if not models:
        raise ValueError("models is empty — fit_isotonic_by first")
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    if "__iso_b" in df.columns:
        raise ValueError("input already has reserved column '__iso_b'")
    bins = {m.bins for m in models.values()}
    if len(bins) != 1:
        raise ValueError(
            f"models disagree on bins ({sorted(bins)}); fit together"
        )
    n_bins = bins.pop()
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(group_col, gtype),
            StructField("__iso_b", LongType()),
            StructField(out_col, DoubleType()),
        ]
    )
    mapping = spark.createDataFrame(
        [
            (gval, b, float(v))
            for gval, m in models.items()
            for b, v in enumerate(m.values)
        ],
        schema,
    )
    s = F.col(score_col).cast("double")
    bucket = F.when(
        s.isNotNull() & ~F.isnan(s),
        F.greatest(
            F.least(
                F.floor(s * F.lit(n_bins)).cast("long"),
                F.lit(n_bins - 1),
            ),
            F.lit(0),
        ),
    )
    return (
        df.withColumn("__iso_b", bucket)
        .join(F.broadcast(mapping), [group_col, "__iso_b"], "left")
        .drop("__iso_b")
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "prob",
) -> DataFrame:
    """Reliability-diagram rows: per equal-width probability bin, the
    row count, mean predicted probability, and empirical positive
    fraction — mean_score ≈ frac_pos everywhere is what 'calibrated'
    means. One data-sized aggregation; ≤ ``n_bins`` output rows
    (empty bins are absent). Null/NaN rows excluded as everywhere."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    rows = scored.where(
        y.isNotNull() & s.isNotNull() & ~F.isnan(y) & ~F.isnan(s)
    ).select(y.cast("long").alias("_y"), s.alias("_s"))
    bucket = F.least(
        F.floor(F.col("_s") * F.lit(n_bins)).cast("long"),
        F.lit(n_bins - 1),
    )
    return (
        rows.groupBy(bucket.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("_s") / F.count(F.lit(1))).alias("mean_score"),
            (
                F.sum("_y").cast("double") / F.count(F.lit(1))
            ).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def calibration_summary(
    scored: DataFrame,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "prob",
) -> DataFrame:
    """One row: ECE (expected calibration error — the bin-weighted
    mean |frac_pos − mean_score| over the reliability bins) and the
    Brier score (mean squared error of the probabilities). Same ONE
    data-sized aggregation as :func:`calibration_bins` with the
    squared-error sum riding it; the fold Σ|sy_b − ss_b| / N ≡
    Σ (n_b/N)·|frac_pos_b − mean_score_b| runs as a single aggregate
    over the ≤ ``n_bins`` bucket rows (classifier_eval's one-consumer
    discipline — no lineage branching)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    rows = scored.where(
        y.isNotNull() & s.isNotNull() & ~F.isnan(y) & ~F.isnan(s)
    ).select(y.alias("_y"), s.alias("_s"))
    bucket = F.least(
        F.floor(F.col("_s") * F.lit(n_bins)).cast("long"),
        F.lit(n_bins - 1),
    )
    base = rows.groupBy(bucket.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_s").alias("_ss"),
        F.sum("_y").alias("_sy"),
        F.sum((F.col("_s") - F.col("_y")) * (F.col("_s") - F.col("_y"))).alias(
            "_se"
        ),
    )
    return base.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
        F.when(
            F.sum("_n") > 0,
            F.sum(
                F.abs(
                    F.col("_sy") - F.col("_ss")
                )
            )
            / F.sum("_n"),
        ).alias("ece"),
        F.when(F.sum("_n") > 0, F.sum("_se") / F.sum("_n")).alias("brier"),
    )
