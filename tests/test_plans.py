"""Plan-shape assertions: the scale claims hold on the actual physical
plans, checked via etl_data_lake_spark.plans."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_dim_joins_broadcast(spark):
    from etl_data_lake_spark.plans import assert_broadcast_join
    from etl_data_lake_spark.queries.registry import queries

    q = queries()["q01_top_parts_by_lineitems"](spark, SF_DIR)
    assert_broadcast_join(q)


def test_filters_reach_parquet_scan(spark):
    from pyspark.sql import functions as F

    from etl_data_lake_spark.plans import explain_report
    from etl_data_lake_spark.sources.catalog import load_table

    df = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    rep = explain_report(df)
    assert any("o_orderstatus" in p for p in rep.pushed_filters), rep.pushed_filters
    # column pruning: the scan reads only what the query touches
    assert rep.scan_schemas and "o_orderpriority" not in rep.scan_schemas[0]


def test_bucketed_join_report_no_exchange(spark, tmp_path):
    from etl_data_lake_spark.plans import assert_no_exchange
    from etl_data_lake_spark.sources.bucketed import drop_table, write_bucketed
    from etl_data_lake_spark.sources.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            orders.withColumnRenamed("o_custkey", "k"),
            "ord_p", str(tmp_path / "o"), ["k"], buckets=4,
        )
        grouped = spark.table("ord_p").groupBy("k").count()
        # aggregation on the bucket key needs no shuffle either
        assert_no_exchange(grouped)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        drop_table(spark, "ord_p")
