"""Operator-level unit tests — reference edge semantics (SURVEY §5)
and the operators whose guarantees the oracle can't see."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_drop_null_keys_empty_string_vs_null(spark):
    """etl.py:68-70 needs BOTH filter('!=\"\"') and dropna — verify our
    single operator drops both kinds."""
    from etl_data_lake_spark.operators.relational import drop_null_keys

    df = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="", v=2), Row(k=None, v=3)],
        "k string, v int",
    )
    got = {r.v for r in drop_null_keys(df, ["k"]).collect()}
    assert got == {1}


def test_dedup_latest_keeps_newest(spark):
    from etl_data_lake_spark.operators.relational import dedup_latest

    df = spark.createDataFrame(
        [("u1", "free", 1), ("u1", "paid", 2), ("u2", "free", 5)],
        "user_id string, level string, ts long",
    )
    got = {(r.user_id, r.level) for r in dedup_latest(df, ["user_id"], "ts").collect()}
    assert got == {("u1", "paid"), ("u2", "free")}


def test_surrogate_key_dense_and_deterministic(spark):
    from etl_data_lake_spark.operators.windows import surrogate_key

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "x")], "grp int, k string"
    )
    out = surrogate_key(df, ["grp"], [F.desc("k")])
    got = {(r.grp, r.k, r.surrogate_id) for r in out.collect()}
    assert got == {(1, "c", 1), (1, "b", 2), (1, "a", 3), (2, "x", 1)}


def test_sessionize_gap_semantics(spark):
    from etl_data_lake_spark.operators.windows import sessionize

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [("u", at(0)), ("u", at(10)), ("u", at(50)), ("u", at(55)), ("v", at(0))],
        "user_id string, ts timestamp_ntz",
    )
    out = sessionize(df, "user_id", "ts", gap_minutes=30)
    got = {(r.user_id, r.ts.minute, r.session_id) for r in out.collect()}
    assert got == {("u", 0, 1), ("u", 10, 1), ("u", 50, 2), ("u", 55, 2), ("v", 0, 1)}


def test_asof_join_backward_semantics(spark):
    from etl_data_lake_spark.operators.joins import asof_join

    t = datetime.datetime
    left = spark.createDataFrame(
        [(1, "k", t(2024, 1, 5)), (2, "k", t(2024, 1, 1)), (3, "z", t(2024, 1, 5))],
        "id long, k string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("k", t(2024, 1, 2), 20.0), ("k", t(2024, 1, 4), 40.0)],
        "k string, rts timestamp_ntz, price double",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["price"])
    got = {(r.id, r.asof_price) for r in out.collect()}
    # id=1: latest right at/before Jan5 is Jan4 (40); id=2: none before Jan1;
    # id=3: key z has no right rows at all
    assert got == {(1, 40.0), (2, None), (3, None)}


def test_topk_plan_is_take_ordered(spark):
    """ORDER BY + LIMIT must plan as distributed top-k, not full sort."""
    from etl_data_lake_spark.operators.topk import top_k

    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    plan = top_k(df, [F.desc("v"), F.asc("id")], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_broadcast_hint_survives_in_plan(spark):
    from etl_data_lake_spark.operators.joins import dim_join

    fact = spark.range(10000).withColumn("k", F.col("id") % 100)
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("name"))
    plan = (
        dim_join(fact, dim, on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_approx_distinct_within_tolerance(spark):
    from etl_data_lake_spark.queries.registry import queries
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    approx = {
        r.o_orderstatus: r.n_customers_approx
        for r in queries()["approx_distinct_customers"](spark, SF_DIR).collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r.o_orderstatus: r.n
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 2), k


def test_approx_percentile_within_tolerance(spark):
    """approx_percentile_prices (GK sketch, the 100 TB percentile
    path) stays within the sketch's rank-error bound of the exact
    library twin: with accuracy=10000 the rank error is <= n/10000,
    so on this fixture the returned element's VALUE must sit between
    the exact quantile_cont values at p +/- 2%."""
    from etl_data_lake_spark.queries.advanced_rel import percentile_prices
    from etl_data_lake_spark.queries.registry import queries
    from etl_data_lake_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    approx = {
        r.o_orderpriority: (r.median_price_approx, r.p90_price_approx, r.n_orders)
        for r in queries()["approx_percentile_prices"](spark, SF_DIR).collect()
    }
    orders = load_table(spark, SF_DIR, "orders")
    bounds = {
        r.o_orderpriority: r.b
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile(o_totalprice,"
                " array(0.48, 0.52, 0.88, 0.92))"
            ).alias("b")
        )
        .collect()
    }
    exact_n = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert approx.keys() == bounds.keys()
    for k, (p50, p90, n) in approx.items():
        lo50, hi50, lo90, hi90 = bounds[k]
        assert lo50 <= p50 <= hi50, (k, p50, lo50, hi50)
        assert lo90 <= p90 <= hi90, (k, p90, lo90, hi90)
        assert n == exact_n[k]
