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


# ------------------------------------- histogram algebra (round 9) --


def test_merge_histograms_equals_histogram_of_union(spark):
    """day1 ⊕ day2 ≡ histogram(day1 ∪ day2) — the mergeability the
    fixed caller bounds buy."""
    from etl_data_lake_spark.operators.profile import (
        merge_histograms,
        numeric_histogram,
    )

    d1 = spark.createDataFrame(
        [(float(i),) for i in range(0, 50)], "x double"
    )
    d2 = spark.createDataFrame(
        [(float(i),) for i in range(30, 120)], "x double"
    )
    h1 = numeric_histogram(d1, "x", bins=10, lo=0.0, hi=100.0)
    h2 = numeric_histogram(d2, "x", bins=10, lo=0.0, hi=100.0)
    merged = {
        (r["bucket"], r["n"])
        for r in merge_histograms(h1, h2).collect()
    }
    direct = {
        (r["bucket"], r["n"])
        for r in numeric_histogram(
            d1.union(d2), "x", bins=10, lo=0.0, hi=100.0
        ).collect()
    }
    assert merged == direct


def test_histogram_quantiles_hand_computed(spark):
    """Uniform integers 0..99 over 10 exact-width buckets: the linear
    interpolation is checkable by hand, and every estimate is within
    one bucket width of the true quantile."""
    from etl_data_lake_spark.operators.profile import (
        histogram_quantiles,
        numeric_histogram,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "x double"
    )
    h = numeric_histogram(df, "x", bins=10, lo=0.0, hi=100.0)
    q50, q90, q0, q1 = histogram_quantiles(h, [0.5, 0.9, 0.0, 1.0])
    assert abs(q50 - 50.0) <= 10.0 and abs(q90 - 90.0) <= 10.0
    # exact interpolation: each bucket holds 10 of 100 → target 50
    # lands at the end of bucket 5 → exactly 50.0
    assert q50 == 50.0 and q90 == 90.0
    assert q0 == 0.0 and q1 == 100.0


def test_histogram_quantiles_overflow_clamps_and_validates(spark):
    from etl_data_lake_spark.operators.profile import (
        histogram_quantiles,
        merge_histograms,
        numeric_histogram,
    )

    df = spark.createDataFrame(
        [(5.0,), (500.0,), (600.0,)], "x double"
    )
    h = numeric_histogram(df, "x", bins=4, lo=0.0, hi=100.0)
    # 2 of 3 rows overflow: the q=0.9 estimate clamps to hi=100
    (q9,) = histogram_quantiles(h, [0.9])
    assert q9 == 100.0
    # mismatched parameters are rejected, not silently averaged
    other = numeric_histogram(df, "x", bins=4, lo=0.0, hi=200.0)
    bad = merge_histograms(h, other)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different"):
        histogram_quantiles(bad, [0.5])
    with _pytest.raises(ValueError, match="quantiles must be"):
        histogram_quantiles(h, [1.5])
    empty = numeric_histogram(
        df.where("x < -1"), "x", bins=4, lo=0.0, hi=100.0
    )
    with _pytest.raises(ValueError, match="empty histogram"):
        histogram_quantiles(empty, [0.5])


# ---------------------------------------------------------------------------
# PSI drift detection (round 10 s2)
# ---------------------------------------------------------------------------


def test_psi_zero_on_identical_distribution(spark):
    from etl_data_lake_spark.operators.profile import (
        drift_report,
        population_stability_index,
    )

    df = spark.range(0, 5000).select((F.col("id") % 100).alias("v"))
    psi = population_stability_index(
        drift_report(df, df, "v", bins=10, lo=0.0, hi=100.0)
    )
    assert abs(psi) < 1e-12


def test_psi_matches_hand_computation(spark):
    import math

    from etl_data_lake_spark.operators.profile import (
        drift_report,
        population_stability_index,
    )

    # ref: 80 in [0,1), 20 in [1,2); cand: 50/50 — two live buckets
    ref = spark.createDataFrame(
        [(0.5,)] * 80 + [(1.5,)] * 20, "v double"
    )
    cand = spark.createDataFrame(
        [(0.5,)] * 50 + [(1.5,)] * 50, "v double"
    )
    psi = population_stability_index(
        drift_report(ref, cand, "v", bins=2, lo=0.0, hi=2.0)
    )
    want = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(
        0.5 / 0.2
    )
    # empty buckets contribute (min_rate - min_rate)·ln(1) = 0
    assert abs(psi - want) < 1e-9


def test_psi_detects_shift_and_grades(spark):
    from etl_data_lake_spark.operators.profile import (
        drift_report,
        population_stability_index,
    )

    ref = spark.range(0, 4000).select((F.col("id") % 100).alias("v"))
    slight = spark.range(0, 4000).select(
        ((F.col("id") % 100) * 1.05).alias("v")
    )
    big = spark.range(0, 4000).select(
        ((F.col("id") % 100) + 50).alias("v")
    )
    p_small = population_stability_index(
        drift_report(ref, slight, "v", bins=10, lo=0.0, hi=150.0)
    )
    p_big = population_stability_index(
        drift_report(ref, big, "v", bins=10, lo=0.0, hi=150.0)
    )
    assert 0 <= p_small < p_big
    assert p_big > 0.25  # the conventional "investigate" grade


def test_psi_empty_side_raises(spark):
    import pytest

    from etl_data_lake_spark.operators.profile import drift_report

    ref = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    empty = ref.where(F.lit(False))
    with pytest.raises(Exception, match="configuration error"):
        drift_report(ref, empty, "v", bins=5, lo=0.0, hi=100.0).collect()
    with pytest.raises(ValueError, match="min_rate"):
        drift_report(ref, ref, "v", bins=5, lo=0.0, hi=100.0, min_rate=0.0)


def test_histogram_sink_exactly_once_and_drift_composition(spark, tmp_path):
    from etl_data_lake_spark.operators.profile import (
        drift_report_from_histograms,
        histogram_sink,
        numeric_histogram,
        population_stability_index,
        read_histogram,
    )
    from etl_data_lake_spark.sources.txn import TxnTable

    path = str(tmp_path / "hist")
    fn = histogram_sink(spark, path, "v", bins=10, lo=0.0, hi=100.0)
    b1 = spark.range(0, 3000).select((F.col("id") % 100).cast("double").alias("v"))
    b2 = spark.range(0, 2000).select(
        ((F.col("id") % 50) + 50).cast("double").alias("v")
    )
    fn(b1, 0)
    fn(b2, 1)
    tbl = TxnTable(spark, path)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # folded state == from-scratch histogram of the whole history
    whole = numeric_histogram(
        b1.unionByName(b2), "v", bins=10, lo=0.0, hi=100.0
    )
    assert rows(tbl.snapshot()) == rows(whole)
    # replay no-op: version and content unchanged
    v = tbl.latest_version()
    before = rows(tbl.snapshot())
    fn(b2, 1)
    assert tbl.latest_version() == v and rows(tbl.snapshot()) == before
    # drift composition: stream state vs a reference profile — zero
    # data scans at read time
    ref = numeric_histogram(b1, "v", bins=10, lo=0.0, hi=100.0)
    psi = population_stability_index(
        drift_report_from_histograms(ref, read_histogram(spark, path))
    )
    assert psi > 0  # the 50-100 bump shifted the distribution
    same = population_stability_index(
        drift_report_from_histograms(ref, ref)
    )
    assert abs(same) < 1e-12


def test_psi_out_of_range_mass_joins_as_one_bucket(spark):
    """REGRESSION (self-review): under/overflow buckets carry NULL
    open-ended bounds; a join keyed on the bounds never matches NULLs,
    so each side's out-of-range mass split into two phantom buckets
    and inflated PSI. Identical distributions WITH out-of-range mass
    must still score PSI == 0."""
    from etl_data_lake_spark.operators.profile import (
        drift_report,
        population_stability_index,
    )

    df = spark.createDataFrame(
        [(-5.0,)] * 30 + [(50.0,)] * 40 + [(150.0,)] * 30, "v double"
    )
    report = drift_report(df, df, "v", bins=4, lo=0.0, hi=100.0)
    rows = report.collect()
    # one row per bucket id — no phantom splits
    assert len({r["bucket"] for r in rows}) == len(rows)
    assert abs(population_stability_index(report)) < 1e-12
    # and the under/overflow rows carry BOTH sides' counts
    by_b = {r["bucket"]: r for r in rows}
    assert by_b[0]["n_ref"] == 30 and by_b[0]["n_cand"] == 30
    assert by_b[5]["n_ref"] == 30 and by_b[5]["n_cand"] == 30
