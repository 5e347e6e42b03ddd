"""Multi-format readers: schema enforcement + bad-record policies."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("name", StringType())]
)


@pytest.fixture(scope="module")
def dirty_json(tmp_path_factory):
    p = tmp_path_factory.mktemp("dirty") / "data.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "fine"}\n'
    )
    return str(p)


@pytest.fixture(scope="module")
def dirty_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("dirtycsv") / "data.csv"
    p.write_text("id,name\n1,ok\nnot-a-number,bad\n2,fine\n")
    return str(p)


def test_json_capture_quarantines(spark, dirty_json):
    from etl_data_lake_spark.sources.readers import read_json, split_corrupt

    df = read_json(spark, dirty_json, SCHEMA)
    clean, bad = split_corrupt(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]["_corrupt"]


def test_json_failfast_raises(spark, dirty_json):
    from etl_data_lake_spark.sources.readers import read_json

    df = read_json(spark, dirty_json, SCHEMA, on_error="fail")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()


def test_json_drop_loses_bad_rows(spark, dirty_json):
    from etl_data_lake_spark.sources.readers import read_json

    df = read_json(spark, dirty_json, SCHEMA, on_error="drop")
    assert df.count() == 2


def test_csv_capture_quarantines(spark, dirty_csv):
    from etl_data_lake_spark.sources.readers import read_csv, split_corrupt

    clean, bad = split_corrupt(read_csv(spark, dirty_csv, SCHEMA))
    assert {r.id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1


def test_parquet_reader_prunes(spark):
    from etl_data_lake_spark.sources.readers import read_parquet
    from tests.conftest import SF_DIR

    one_col = StructType([StructField("o_orderkey", LongType())])
    df = read_parquet(spark, f"{SF_DIR}/orders.parquet", one_col)
    assert df.columns == ["o_orderkey"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o_totalprice" not in plan  # scan reads only the asked column


def test_orc_round_trip(spark, tmp_path):
    """ORC source/sink (built-in columnar alternative to parquet):
    schema and values survive a write/read cycle, and predicate
    pushdown reaches the ORC scan like it does for parquet."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    lo = back.where(F.col("o_orderkey") < 100)
    plan = lo._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_csv_round_trip(spark, tmp_path):
    """CSV sink/source: schema-enforced read of our own write (no
    inference), values survive, and the scan prunes columns."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    nation = load_table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(nation.schema).option("header", True).csv(out)
    assert back.schema == nation.schema
    assert back.count() == nation.count()
    assert (
        back.select("n_name").exceptAll(nation.select("n_name")).count() == 0
    )
