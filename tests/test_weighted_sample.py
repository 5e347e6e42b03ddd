"""Weighted deterministic sampling (operators/sampling.weighted_sample):
A-ES order sampling — weight-proportional without replacement, layout
invariant, nested across sizes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.sampling import weighted_sample


def _df(spark):
    # 500 heavy rows (w=10) and 500 light rows (w=1)
    return spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 500, 10.0).otherwise(1.0).alias("w"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("dom"),
    )


def test_weight_proportional_and_deterministic(spark):
    df = _df(spark)
    got = weighted_sample(df, 100, "w", ("id",))
    rows = got.collect()
    assert len(rows) == 100
    heavy = sum(1 for r in rows if r["w"] == 10.0)
    # heavy class carries ~10/11 of the mass; expected ≈ 88 of 100.
    # The draw is DETERMINISTIC (content hash), so the band is a
    # regression pin, not a flaky statistical test.
    assert 75 <= heavy <= 99
    again = {
        r["id"]
        for r in weighted_sample(df.repartition(13), 100, "w", ("id",)).collect()
    }
    assert {r["id"] for r in rows} == again


def test_nested_across_sizes(spark):
    df = _df(spark)
    top50 = {r["id"] for r in weighted_sample(df, 50, "w", ("id",)).collect()}
    top100 = {r["id"] for r in weighted_sample(df, 100, "w", ("id",)).collect()}
    assert top50 < top100


def test_nonpositive_weights_excluded(spark):
    df = _df(spark).withColumn(
        "w",
        F.when(F.col("id") < 10, F.lit(None).cast("double"))
        .when(F.col("id") < 20, -1.0)
        .when(F.col("id") < 30, 0.0)
        .otherwise(F.col("w")),
    )
    got = weighted_sample(df, 2000, "w", ("id",))
    ids = {r["id"] for r in got.collect()}
    assert len(ids) == 970 and not ids & set(range(30))


def test_stratified_counts_and_bias(spark):
    df = _df(spark)
    got = weighted_sample(df, 40, "w", ("id",), stratum_col="dom")
    per = {
        r["dom"]: r["n"]
        for r in got.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"even": 40, "odd": 40}
    heavy = got.where(F.col("w") == 10.0).count()
    assert heavy >= 60  # of 80, weight-biased in both strata


def test_validation_and_schema(spark):
    df = _df(spark)
    assert weighted_sample(df, 100, "w", ("id",)).columns == df.columns
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample(df, 0, "w", ("id",))
    with pytest.raises(ValueError, match="__wrank"):
        weighted_sample(df.withColumn("__wrank", F.lit(1)), 5, "w", ("id",))


def test_nan_weights_excluded(spark):
    """Spark orders NaN above every double, so NaN > 0 is TRUE — the
    filter must reject NaN explicitly (review regression)."""
    df = _df(spark).withColumn(
        "w",
        F.when(F.col("id") < 100, F.lit(float("nan"))).otherwise(F.col("w")),
    )
    got = weighted_sample(df, 2000, "w", ("id",))
    ids = {r["id"] for r in got.collect()}
    assert len(ids) == 900 and not ids & set(range(100))
