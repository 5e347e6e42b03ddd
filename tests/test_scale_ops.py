"""Scale-path operators: bucketed co-located joins (no Exchange in the
plan) and skew salting (same results as the unsalted plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from etl_data_lake_spark.sources.bucketed import drop_table, write_bucketed
    from etl_data_lake_spark.sources.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    # disable auto-broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "k"),
            "li_b", str(tmp_path / "li"), ["k"], buckets=4,
        )
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "k"),
            "ord_b", str(tmp_path / "ord"), ["k"], buckets=4,
        )
        joined = spark.table("li_b").join(spark.table("ord_b"), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()  # orderkey is orders' PK

        # control: the same join over plain parquet DOES shuffle
        control = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        assert "Exchange" in _plan(control)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        drop_table(spark, "li_b")
        drop_table(spark, "ord_b")


def test_salted_join_matches_plain(spark):
    from etl_data_lake_spark.operators.skew import salted_join
    from etl_data_lake_spark.sources.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_partkey", "pk"
    )
    part = load_table(spark, SF_DIR, "part").withColumnRenamed(
        "p_partkey", "pk"
    )
    plain = li.join(part, "pk").groupBy("p_brand").count()
    salted = salted_join(li, part, "pk", salts=4).groupBy("p_brand").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_two_phase_agg_matches_plain(spark):
    from etl_data_lake_spark.operators.skew import two_phase_agg_count
    from etl_data_lake_spark.sources.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    got = {
        (r.l_returnflag, r.n)
        for r in two_phase_agg_count(li, "l_returnflag", salts=4).collect()
    }
    assert got == plain

def test_aqe_splits_skewed_join_partition(spark):
    """The runtime half of the skew story (operators/skew.py salting
    is the static half): with skew-join mitigation on, AQE must detect
    the hot key's oversized shuffle partition and split it — the final
    adaptive plan says so explicitly (SortMergeJoin(skew=true) reading
    an 'AQEShuffleRead ... skewed'). Thresholds are scaled down to make
    a 500k-row fixture exhibit what a 100 TB hot key does naturally."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        res = left.join(right, "k").agg(F.count("*").alias("n"))
        assert res.collect()[0].n == 500_000
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
