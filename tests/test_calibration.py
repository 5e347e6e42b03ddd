"""Classifier calibration (functions/calibration): hand-computed
reliability bins and ECE/Brier, temperature/Platt parameter RECOVERY
on data generated at known parameters, improvement on the real NB
quality model, and the codegen/no-UDF plan contract. The DuckDB twin
(quality_model_calibration) is parity-checked in test_parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.calibration import (
    PlattModel,
    calibrate_scores,
    calibration_bins,
    calibration_summary,
    fit_platt,
    fit_temperature,
)
from tests.conftest import SF_DIR


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def test_reliability_bins_hand_computed(spark):
    """4 rows, 2 bins: every output value verifiable by hand."""
    rows = [
        (1, 0.9), (0, 0.8),   # bin 1: n=2, mean .85, frac_pos .5
        (1, 0.2), (0, 0.1),   # bin 0: n=2, mean .15, frac_pos .5
    ]
    df = spark.createDataFrame(rows, "y long, prob double")
    got = {
        r["bin"]: (r["n"], r["mean_score"], r["frac_pos"])
        for r in calibration_bins(df, n_bins=2).collect()
    }
    assert got[0][0] == 2 and math.isclose(got[0][1], 0.15)
    assert math.isclose(got[0][2], 0.5)
    assert got[1][0] == 2 and math.isclose(got[1][1], 0.85)
    assert math.isclose(got[1][2], 0.5)
    # prob == 1.0 clamps into the last bin, never bin n_bins
    edge = spark.createDataFrame([(1, 1.0)], "y long, prob double")
    assert calibration_bins(edge, n_bins=2).collect()[0]["bin"] == 1


def test_summary_hand_computed(spark):
    """ECE = Σ (n_b/N)·|frac_pos_b − mean_score_b|; Brier = mean
    (prob−y)² — both verified against the longhand numbers."""
    rows = [(1, 0.9), (0, 0.8), (1, 0.2), (0, 0.1)]
    df = spark.createDataFrame(rows, "y long, prob double")
    got = calibration_summary(df, n_bins=2).collect()[0]
    assert got["n"] == 4
    # per bin |sum_y - sum_s|: |1 - 1.7| = .7, |1 - 0.3| = .7 → /4
    assert math.isclose(got["ece"], (0.7 + 0.7) / 4)
    brier = (0.1**2 + 0.8**2 + 0.8**2 + 0.1**2) / 4
    assert math.isclose(got["brier"], brier)
    # null/NaN rows are excluded, empty input reports nulls not NaN
    dirty = spark.createDataFrame(
        [(1, float("nan")), (None, 0.5)], "y int, prob double"
    )
    row = calibration_summary(dirty, n_bins=2).collect()[0]
    assert row["n"] == 0 and row["ece"] is None and row["brier"] is None


def _synthetic(spark, a: float, b: float, n_per: int = 2000):
    """Deterministic (y, prob) rows whose labels realize the exact
    base rates sigmoid(a·z + b) at logits z ∈ [-3, 3], while the
    REPORTED prob is the uncalibrated sigmoid(z)."""
    rows = []
    for zi in range(-3, 4):
        z = float(zi)
        n_pos = round(n_per * _sigmoid(a * z + b))
        rows += [(1, _sigmoid(z))] * n_pos
        rows += [(0, _sigmoid(z))] * (n_per - n_pos)
    return spark.createDataFrame(rows, "y long, prob double")


def test_temperature_recovery(spark):
    """Labels generated at sigmoid(z/2) with reported prob sigmoid(z):
    the fitted temperature is ≈ 2 (the model is overconfident 2×)."""
    df = _synthetic(spark, a=0.5, b=0.0)
    m = fit_temperature(df)
    assert m.b == 0.0
    assert abs(m.a - 0.5) < 0.01, m
    assert abs(m.temperature - 2.0) < 0.05


def test_platt_recovery(spark):
    """Labels generated at sigmoid(0.5·z + 0.3): the affine fit
    recovers both the slope and the intercept."""
    df = _synthetic(spark, a=0.5, b=0.3)
    m = fit_platt(df)
    assert abs(m.a - 0.5) < 0.01 and abs(m.b - 0.3) < 0.02, m


def test_calibration_improves_the_real_model(spark):
    """The round-8 composition this exists for: the NB quality model's
    probabilities, Platt-calibrated against its weak labels, have
    lower ECE and Brier than the raw probabilities."""
    from etl_data_lake_spark.queries.quality_model import (
        _scored_with_weak_labels,
    )

    frame = _scored_with_weak_labels(spark, SF_DIR).select(
        F.col("weak_label").alias("y"),
        F.col("log_odds"),
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("log_odds")))
        ).alias("prob"),
    ).persist()
    m = fit_platt(frame, logit_col="log_odds", score_col=None)
    cal = calibrate_scores(
        frame, m, logit_col="log_odds", score_col=None
    )
    before = calibration_summary(frame).collect()[0]
    after = calibration_summary(
        cal.select("y", F.col("prob_calibrated").alias("prob"))
    ).collect()[0]
    frame.unpersist()
    assert after["ece"] < before["ece"]
    assert after["brier"] <= before["brier"] + 1e-12


def test_apply_is_codegen_and_rank_preserving(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.4), (1, 0.6)], "y long, prob double"
    )
    m = PlattModel(a=0.5, b=0.1)
    cal = calibrate_scores(df, m)
    plan = cal._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = cal.collect()
    # sigmoid(a·logit(p) + b), hand-checked on one row
    z = math.log(0.9 / 0.1)
    assert math.isclose(
        [r for r in rows if r["prob"] == 0.9][0]["prob_calibrated"],
        _sigmoid(0.5 * z + 0.1),
        rel_tol=1e-12,
    )
    # temperature scaling is monotone → order preserved
    got = [
        r["prob_calibrated"]
        for r in sorted(rows, key=lambda r: r["prob"])
    ]
    assert got == sorted(got)


def test_validation(spark):
    df = spark.createDataFrame([(1, 0.5)], "y long, prob double")
    with pytest.raises(ValueError, match="exactly one"):
        fit_temperature(df, score_col=None, logit_col=None)
    with pytest.raises(ValueError, match="exactly one"):
        fit_platt(df, score_col="prob", logit_col="prob")
    with pytest.raises(ValueError, match="bins"):
        calibration_bins(df, n_bins=1)
    with pytest.raises(ValueError, match="bins"):
        fit_temperature(df, bins=1)
    with pytest.raises(ValueError, match="already exists"):
        calibrate_scores(
            df.withColumn("prob_calibrated", F.lit(1.0)),
            PlattModel(a=1.0),
        )
    # empty input: identity calibration, not a crash
    empty = df.where(F.lit(False))
    m = fit_platt(empty)
    assert m.a == 1.0 and m.b == 0.0


# ------------------------------------------------ isotonic (round 9) --


def test_pav_hand_computed():
    """The textbook PAV example: rates (w=1 each) .2 .6 .4 .8 — the
    .6/.4 violation pools to .5; everything else stands."""
    from etl_data_lake_spark.functions.calibration import _pav

    assert _pav([(1, 0.2), (1, 0.6), (1, 0.4), (1, 0.8)]) == [
        0.2, 0.5, 0.5, 0.8,
    ]
    # weighted pooling: (w=1, .9) then (w=3, .1) → (1·.9+3·.1)/4 = .3
    pooled = _pav([(1, 0.9), (3, 0.1)])
    assert all(math.isclose(v, 0.3) for v in pooled)
    # already monotone: identity
    assert _pav([(2, 0.1), (1, 0.5), (4, 0.9)]) == [0.1, 0.5, 0.9]


def test_isotonic_fit_and_apply_hand_computed(spark):
    """2 bins over 4 rows with an inverted reliability curve: the fit
    must pool both bins to the global rate, and applying maps every
    score to it."""
    from etl_data_lake_spark.functions.calibration import (
        fit_isotonic,
        isotonic_calibrate,
    )

    rows = [
        (1, 0.2), (1, 0.1),   # low bin: rate 1.0 (over-pessimistic)
        (0, 0.9), (0, 0.8),   # high bin: rate 0.0 (over-optimistic)
    ]
    df = spark.createDataFrame(rows, "y long, prob double")
    m = fit_isotonic(df, bins=2)
    assert m.values == (0.5, 0.5)  # pooled to the global rate
    got = isotonic_calibrate(df, m).collect()
    assert all(r["prob_calibrated"] == 0.5 for r in got)
    assert len(got) == 4  # left join keeps every row

    # monotone input: per-bucket empirical rates come back verbatim,
    # and the fitted values are non-decreasing across buckets
    rows2 = [(0, 0.1), (0, 0.2), (1, 0.3), (1, 0.8), (1, 0.9)]
    df2 = spark.createDataFrame(rows2, "y long, prob double")
    m2 = fit_isotonic(df2, bins=10)
    assert list(m2.values) == sorted(m2.values)
    assert m2.values[1] == 0.0 and m2.values[8] == 1.0
    # empty buckets inherit the nearest block at-or-below (step)
    assert m2.values[5] == m2.values[3]


def test_isotonic_improves_the_real_model(spark):
    """Isotonic calibration on the NB quality model: ECE and Brier
    both improve vs the raw probabilities (the non-parametric twin of
    test_calibration_improves_the_real_model)."""
    from etl_data_lake_spark.functions.calibration import (
        fit_isotonic,
        isotonic_calibrate,
    )
    from etl_data_lake_spark.queries.quality_model import (
        _scored_with_weak_labels,
    )

    frame = _scored_with_weak_labels(spark, SF_DIR).select(
        F.col("weak_label").alias("y"),
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("log_odds")))
        ).alias("prob"),
    ).persist()
    m = fit_isotonic(frame, bins=200)
    cal = isotonic_calibrate(frame, m)
    before = calibration_summary(frame).collect()[0]
    after = calibration_summary(
        cal.select("y", F.col("prob_calibrated").alias("prob"))
    ).collect()[0]
    frame.unpersist()
    assert after["ece"] < before["ece"]
    assert after["brier"] <= before["brier"] + 1e-12


def test_isotonic_null_nan_and_plan(spark):
    """Null/NaN scores calibrate to null (and are excluded from the
    fit); the apply plan is a broadcast join, never a Python UDF."""
    from etl_data_lake_spark.functions.calibration import (
        fit_isotonic,
        isotonic_calibrate,
    )

    rows = [(1, 0.9), (0, 0.1), (1, None), (0, float("nan"))]
    df = spark.createDataFrame(rows, "y long, prob double")
    m = fit_isotonic(df, bins=2)
    assert m.values == (0.0, 1.0)  # the two bad rows never fit
    got = {
        (r["y"], str(r["prob"])): r["prob_calibrated"]
        for r in isotonic_calibrate(df, m).collect()
    }
    assert got[(1, "None")] is None and got[(0, "nan")] is None
    assert got[(1, "0.9")] == 1.0 and got[(0, "0.1")] == 0.0
    plan = (
        isotonic_calibrate(df, m)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_isotonic_validation(spark):
    from etl_data_lake_spark.functions.calibration import (
        IsotonicModel,
        fit_isotonic,
        isotonic_calibrate,
    )

    df = spark.createDataFrame([(1, 0.5)], "y long, prob double")
    with pytest.raises(ValueError, match="bins"):
        fit_isotonic(df, bins=1)
    m = IsotonicModel(bins=2, values=(0.1, 0.9))
    with pytest.raises(ValueError, match="already exists"):
        isotonic_calibrate(
            df.withColumn("prob_calibrated", F.lit(1.0)), m
        )
    with pytest.raises(ValueError, match="__iso_b"):
        isotonic_calibrate(df.withColumn("__iso_b", F.lit(1)), m)
    # empty input: the identity-ish midpoint map, not a crash
    empty = fit_isotonic(df.where(F.lit(False)), bins=4)
    assert empty.values == (0.125, 0.375, 0.625, 0.875)


def test_isotonic_by_group_hand_computed(spark):
    """Two groups with OPPOSITE miscalibration: each gets its own
    curve; a global fit would average them. Rows of an unfitted
    group calibrate to null."""
    from etl_data_lake_spark.functions.calibration import (
        fit_isotonic,
        fit_isotonic_by,
        isotonic_calibrate_by,
    )

    rows = (
        # group A: over-pessimistic low scores (low bin rate 1.0)
        [("A", 1, 0.1), ("A", 1, 0.2), ("A", 0, 0.8), ("A", 0, 0.9)]
        # group B: perfectly calibrated at the bin level
        + [("B", 0, 0.1), ("B", 0, 0.2), ("B", 1, 0.8), ("B", 1, 0.9)]
    )
    df = spark.createDataFrame(rows, "src string, y long, prob double")
    models = fit_isotonic_by(df, "src", bins=2)
    assert set(models) == {"A", "B"}
    assert models["A"].values == (0.5, 0.5)   # inverted → pooled
    assert models["B"].values == (0.0, 1.0)   # monotone → verbatim
    # the global fit flattens B's perfect curve to the pooled 0.5 —
    # the averaging-of-opposite-errors a per-group fit avoids
    g = fit_isotonic(df, bins=2)
    assert g.values == (0.5, 0.5) != models["B"].values
    plus = df.union(
        spark.createDataFrame(
            [("C", 1, 0.5)], "src string, y long, prob double"
        )
    )
    got = {
        (r.src, r.prob): r.prob_calibrated
        for r in isotonic_calibrate_by(plus, models, "src").collect()
    }
    assert got[("A", 0.1)] == 0.5 and got[("A", 0.9)] == 0.5
    assert got[("B", 0.1)] == 0.0 and got[("B", 0.9)] == 1.0
    assert got[("C", 0.5)] is None  # no model → null, not borrowed


def test_isotonic_by_group_validation(spark):
    from etl_data_lake_spark.functions.calibration import (
        IsotonicModel,
        fit_isotonic_by,
        isotonic_calibrate_by,
    )

    df = spark.createDataFrame(
        [("A", 1, 0.5)], "src string, y long, prob double"
    )
    with pytest.raises(ValueError, match="bins"):
        fit_isotonic_by(df, "src", bins=1)
    with pytest.raises(ValueError, match="empty"):
        isotonic_calibrate_by(df, {}, "src")
    mixed = {
        "A": IsotonicModel(bins=2, values=(0.1, 0.9)),
        "B": IsotonicModel(bins=4, values=(0.1, 0.2, 0.3, 0.9)),
    }
    with pytest.raises(ValueError, match="disagree"):
        isotonic_calibrate_by(df, mixed, "src")
    # null groups contribute no evidence
    withnull = spark.createDataFrame(
        [("A", 1, 0.9), (None, 0, 0.9)], "src string, y long, prob double"
    )
    m = fit_isotonic_by(withnull, "src", bins=2)
    assert set(m) == {"A"} and m["A"].values[1] == 1.0
