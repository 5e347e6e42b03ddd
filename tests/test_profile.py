"""One-pass table profiling (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.profile import numeric_histogram, profile


@pytest.fixture(scope="module")
def table(spark):
    return spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 7)
        .alias("mod7"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("s"),
        (F.col("id") / 100.0).alias("x"),
    )


def test_profile_counts_ranges_means(spark, table):
    rows = {r["column"]: r for r in profile(table).collect()}
    assert set(rows) == {"id", "mod7", "s", "x"}
    assert all(r["n_rows"] == 1000 for r in rows.values())
    assert rows["mod7"]["n_nulls"] == 100
    assert rows["id"]["n_nulls"] == 0
    assert (rows["id"]["min_str"], rows["id"]["max_str"]) == ("0", "999")
    assert (rows["s"]["min_str"], rows["s"]["max_str"]) == ("s0", "s2")
    assert rows["x"]["mean"] == pytest.approx(4.995, abs=1e-9)
    assert rows["s"]["mean"] is None  # non-numeric
    # HLL++ distinct within its default ~2-3% relative error
    assert abs(rows["id"]["approx_distinct"] - 1000) <= 50
    assert abs(rows["s"]["approx_distinct"] - 3) <= 1


def test_profile_is_one_job_shape(spark, table):
    from etl_data_lake_spark.plans import plan_string

    plan = plan_string(profile(table), "executed")
    # one partial+final aggregate pair: a single Exchange, no join
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_profile_column_subset_and_validation(spark, table):
    got = profile(table, cols=("id",)).collect()
    assert len(got) == 1 and got[0]["column"] == "id"
    with pytest.raises(ValueError, match="no columns"):
        profile(table, cols=())


def test_histogram_fixed_width_with_flows(spark, table):
    # x uniform in [0, 9.99]; bound [2, 8) x 3 bins of width 2
    h = {
        r["bucket"]: r
        for r in numeric_histogram(table, "x", 3, 2.0, 8.0).collect()
    }
    assert h[0]["n"] == 200  # underflow x < 2
    assert h[4]["n"] == 200  # overflow  x >= 8
    assert all(h[b]["n"] == 200 for b in (1, 2, 3))
    assert (h[1]["bucket_lo"], h[1]["bucket_hi"]) == (2.0, 4.0)
    assert h[0]["bucket_lo"] is None  # open-ended underflow
    assert h[4]["bucket_hi"] is None
    # nulls dropped
    hn = numeric_histogram(table, "mod7", 7, 0.0, 7.0)
    assert hn.agg(F.sum("n")).collect()[0][0] == 900


def test_histogram_validation(spark, table):
    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(table, "x", 0, 0.0, 1.0)
    with pytest.raises(ValueError, match="lo < hi"):
        numeric_histogram(table, "x", 3, 5.0, 5.0)


def test_profile_handles_dotted_column_names(spark):
    df = spark.range(5).select(
        F.col("id").alias("a.b"),
        (F.col("id") * 2.0).alias("x`y"),
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert set(rows) == {"a.b", "x`y"}
    assert rows["a.b"]["n_rows"] == 5 and rows["a.b"]["n_nulls"] == 0
    assert rows["x`y"]["mean"] == pytest.approx(4.0)


def test_histogram_drops_nan_not_a_null_bucket(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (3.0,)], "x double"
    )
    h = numeric_histogram(df, "x", 2, 0.0, 4.0).collect()
    assert all(r["bucket"] is not None for r in h)
    assert sum(r["n"] for r in h) == 2  # NaN and null both dropped
