"""Data-quality expectations (operators/expectations.py): one-pass
report, null-is-violation semantics, quarantine split, uniqueness and
referential-integrity counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.expectations import (
    expectations_report,
    orphan_count,
    quarantine,
)


def _df(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -5.0, "b"),      # violates positive
        (3, None, "c"),      # violates positive (NULL is not proof)
        (None, 7.0, "d"),    # violates id_not_null
        (5, 8.0, None),
        (5, 9.0, "e"),       # duplicate id 5
    ]
    return spark.createDataFrame(rows, "id int, price double, tag string")


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "id_not_null": F.col("id").isNotNull(),
        "positive_price": F.col("price") > 0,
    }


def test_report_counts_and_null_semantics(spark):
    rep = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in expectations_report(
            _df(spark), _rules(), unique=(("id",),)
        ).collect()
    }
    assert rep["id_not_null"] == (6, 1, False)
    # NULL price counts as a violation, like -5.0
    assert rep["positive_price"] == (6, 2, False)
    # two rows share id 5 -> 1 row beyond the first (null id groups
    # count too only if duplicated; here null id is unique)
    assert rep["unique(id)"] == (6, 1, False)
    frac = {
        r["rule"]: r["violation_frac"]
        for r in expectations_report(_df(spark), _rules()).collect()
    }
    assert frac["positive_price"] == pytest.approx(2 / 6)


def test_report_passes_on_clean_data(spark):
    clean = spark.createDataFrame(
        [(1, 1.0, "x"), (2, 2.0, "y")], "id int, price double, tag string"
    )
    rep = expectations_report(clean, _rules(), unique=(("id",),))
    assert all(r["passed"] for r in rep.collect())


def test_quarantine_split_and_tags(spark):
    valid, invalid = quarantine(_df(spark), _rules())
    assert valid.columns == _df(spark).columns
    assert {r["tag"] for r in valid.collect()} == {"a", None, "e"}
    tags = {
        (r["id"], r["price"]): sorted(r["_violations"])
        for r in invalid.collect()
    }
    assert tags[(2, -5.0)] == ["positive_price"]
    assert tags[(3, None)] == ["positive_price"]
    assert tags[(None, 7.0)] == ["id_not_null"]
    # counts line up with the report
    rep = {
        r["rule"]: r["n_violations"]
        for r in expectations_report(_df(spark), _rules()).collect()
    }
    assert invalid.count() == 3 and sum(rep.values()) == 3


def test_quarantine_composes_and_validates(spark):
    valid, _ = quarantine(_df(spark), _rules())
    # quarantined-valid output feeds an Arrow stage without tripping
    # the projection-collapse trap (tag array is concat, not a lambda)
    from etl_data_lake_spark.functions.text import shingle_hashes_pandas_udf

    n = (
        valid.where(F.col("tag").isNotNull())
        .withColumn("sh", shingle_hashes_pandas_udf(1)(F.col("tag")))
        .count()
    )
    assert n == 2
    with pytest.raises(ValueError, match="no expectations"):
        quarantine(_df(spark), {})
    with pytest.raises(ValueError, match="_violations"):
        quarantine(_df(spark).withColumn("_violations", F.lit(1)), _rules())
    with pytest.raises(ValueError, match="no expectations"):
        expectations_report(_df(spark), {})


def test_orphan_count_referential_integrity(spark):
    dim = spark.createDataFrame([(1,), (2,), (5,)], "k int")
    row = orphan_count(_df(spark), dim, ("id", "k")).collect()[0]
    # id 3 unmatched; null id is an orphan too (a null FK proves nothing)
    assert row["rule"] == "fk(id->k)" and row["n_violations"] == 2


def test_report_is_one_job_over_the_scan(spark):
    """All row rules aggregate in ONE pass: the plan has a single scan
    of the input for the rules-only report."""
    from etl_data_lake_spark.plans.inspect import plan_string

    rep = expectations_report(_df(spark), _rules())
    plan = plan_string(rep)
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2
    assert "Python" not in plan


def test_report_on_real_table(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    rep = {
        r["rule"]: r["passed"]
        for r in expectations_report(
            orders,
            {
                "key_not_null": F.col("o_orderkey").isNotNull(),
                "price_positive": F.col("o_totalprice") > 0,
            },
            unique=(("o_orderkey",),),
        ).collect()
    }
    assert rep == {
        "key_not_null": True,
        "price_positive": True,
        "unique(o_orderkey)": True,
    }


def test_empty_frame_reports_zero_violations(spark):
    """An empty batch is CLEAN, not unknown: n_violations 0 and passed
    true (an all-NULL audit row would flip falsy publication gates —
    review regression)."""
    empty = spark.createDataFrame([], "id int, price double, tag string")
    rep = expectations_report(empty, _rules(), unique=(("id",),)).collect()
    assert len(rep) == 3
    for r in rep:
        assert r["n_rows"] == 0 and r["n_violations"] == 0
        assert r["passed"] is True and r["violation_frac"] == 0.0


def test_rule_names_with_dots_and_backticks(spark):
    """Rule names are labels, not column references — dots or backticks
    in them must not break internal column resolution (internal aliases
    are index-based; review regression)."""
    rep = {
        r["rule"]: r["n_violations"]
        for r in expectations_report(
            _df(spark),
            {
                "price.usd positive": F.col("price") > 0,
                "id`weird": F.col("id").isNotNull(),
            },
        ).collect()
    }
    assert rep == {"price.usd positive": 2, "id`weird": 1}


# ------------------------------------ streaming gate (round 9) --


def test_stream_sink_drop_mode_routes_and_replays(spark, tmp_path):
    """Valid rows land in the valid table, violations (tagged) in the
    quarantine table; a replayed micro-batch no-ops BOTH tables; a
    crash between the two appends recovers exactly-once per table."""
    from etl_data_lake_spark.operators.expectations import (
        expectations_stream_sink,
    )
    from etl_data_lake_spark.sources.txn import TxnTable

    rules = {"pos": F.col("x") > 0, "named": F.col("name").isNotNull()}
    vp, qp = str(tmp_path / "valid"), str(tmp_path / "quar")
    fn = expectations_stream_sink(spark, rules, vp, qp)
    b0 = spark.createDataFrame(
        [(1, "a"), (-5, "b"), (2, None)], "x long, name string"
    )
    fn(b0, 0)
    vt, qt = TxnTable(spark, vp), TxnTable(spark, qp)
    assert [(r.x, r.name) for r in vt.snapshot().collect()] == [(1, "a")]
    quar = {
        r.x: sorted(r._violations) for r in qt.snapshot().collect()
    }
    assert quar == {-5: ["pos"], 2: ["named"]}
    # replay: both tables unchanged
    v_v, q_v = vt.latest_version(), qt.latest_version()
    fn(b0, 0)
    assert (vt.latest_version(), qt.latest_version()) == (v_v, q_v)
    # crash window: batch 1's valid append landed, quarantine did not
    b1 = spark.createDataFrame(
        [(7, "c"), (-1, "d")], "x long, name string"
    )
    vt.append(
        b1.where("x > 0"), app_id="__expect_sink__", txn_seq=1
    )
    fn(b1, 1)  # replay of the whole batch
    assert sorted(r.x for r in vt.snapshot().collect()) == [1, 7]
    assert sorted(r.x for r in qt.snapshot().collect()) == [-5, -1, 2]


def test_stream_sink_all_valid_batch_and_fail_mode(spark, tmp_path):
    from etl_data_lake_spark.operators.expectations import (
        expectations_stream_sink,
    )
    from etl_data_lake_spark.sources.txn import TxnTable
    import pytest as _pytest

    rules = {"pos": F.col("x") > 0}
    vp, qp = str(tmp_path / "valid"), str(tmp_path / "quar")
    fn = expectations_stream_sink(spark, rules, vp, qp)
    clean = spark.createDataFrame([(3,), (4,)], "x long")
    fn(clean, 0)  # empty quarantine append must not crash
    assert TxnTable(spark, vp).snapshot().count() == 2
    # fail mode: any violation raises, nothing commits
    fp = str(tmp_path / "failv")
    ffn = expectations_stream_sink(spark, rules, fp, mode="fail")
    ffn(clean, 0)
    ft = TxnTable(spark, fp)
    n0, v0 = ft.snapshot().count(), ft.latest_version()
    dirty = spark.createDataFrame([(5,), (-1,)], "x long")
    with _pytest.raises(ValueError, match="violates expectations"):
        ffn(dirty, 1)
    assert ft.snapshot().count() == n0 and ft.latest_version() == v0
    with _pytest.raises(ValueError, match="mode must be"):
        expectations_stream_sink(spark, rules, fp, mode="warn")
    with _pytest.raises(ValueError, match="no expectations"):
        expectations_stream_sink(spark, {}, fp)
