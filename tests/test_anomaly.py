"""Trailing z-score anomaly detection (operators/anomaly.py):
hand-computed scores, strictly-preceding baseline, thin/flat-baseline
nulls, alert filter."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.anomaly import anomalies, trailing_zscores


def _df(spark):
    rows = [(1, i, v) for i, v in enumerate([10.0, 12.0, 11.0, 10.5, 50.0, 11.0])]
    rows += [(2, 0, 5.0), (2, 1, 5.0), (2, 2, 5.0), (2, 3, 5.0)]  # flat
    return spark.createDataFrame(rows, "k int, t int, v double")


def test_hand_computed_and_exclusion_of_self(spark):
    got = {
        (r["k"], r["t"]): r["zscore"]
        for r in trailing_zscores(
            _df(spark), "v", ("k",), ("t",), window=10, min_periods=3
        ).collect()
    }
    # first three rows of k=1: fewer than 3 trailing points -> null
    assert got[(1, 0)] is None and got[(1, 1)] is None and got[(1, 2)] is None
    base = [10.0, 12.0, 11.0, 10.5]
    want = (50.0 - statistics.mean(base)) / statistics.stdev(base)
    assert got[(1, 4)] == pytest.approx(want, rel=1e-12)
    # the spike does NOT contaminate its own baseline, but it does
    # enter the NEXT row's baseline
    base5 = base + [50.0]
    want5 = (11.0 - statistics.mean(base5)) / statistics.stdev(base5)
    assert got[(1, 5)] == pytest.approx(want5, rel=1e-12)
    # zero-variance baseline -> null, never a division blow-up
    assert got[(2, 3)] is None


def test_alert_filter_and_validation(spark):
    hits = anomalies(
        _df(spark), "v", ("k",), ("t",), threshold=3.0
    ).collect()
    assert [(r["k"], r["t"]) for r in hits] == [(1, 4)]
    with pytest.raises(ValueError, match="window"):
        trailing_zscores(_df(spark), "v", ("k",), ("t",), window=0)
    with pytest.raises(ValueError, match="min_periods"):
        trailing_zscores(
            _df(spark), "v", ("k",), ("t",), window=5, min_periods=6
        )


def test_single_window_pass_plan(spark):
    from etl_data_lake_spark.plans.inspect import plan_string

    out = trailing_zscores(_df(spark), "v", ("k",), ("t",))
    plan = plan_string(out)
    assert plan.count("Window") <= 2 and "Python" not in plan


def test_out_col_clash_raises(spark):
    import pytest

    df = _df(spark).withColumn("zscore", F.lit(0.0))
    with pytest.raises(ValueError, match="zscore"):
        trailing_zscores(df, "v", ("k",), ("t",))
