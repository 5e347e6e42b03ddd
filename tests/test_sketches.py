"""Mergeable HLL distinct-count sketches (operators/sketches.py):
estimate accuracy, rollup-by-merge vs exact, parquet persistence of
the sketch column, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.sketches import (
    distinct_sketches,
    rollup_distinct,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )


def _exact(spark, *cols):
    ev = _events(spark)
    if cols:
        return {
            tuple(r[c] for c in cols): r["n"]
            for r in ev.groupBy(*cols)
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
    return ev.select("user_id").distinct().count()


def test_fine_sketches_accurate(spark):
    sk = distinct_sketches(_events(spark), ("day", "event_type"), "user_id")
    est = {
        (r["day"], r["event_type"]): r["n_distinct"]
        for r in rollup_distinct(sk, ("day", "event_type")).collect()
    }
    exact = _exact(spark, "day", "event_type")
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), k


def test_rollup_by_merge_matches_exact_without_rescan(spark):
    sk = distinct_sketches(_events(spark), ("day", "event_type"), "user_id")
    # coarser grains computed ONLY from the sketch rows
    by_type = {
        r["event_type"]: r["n_distinct"]
        for r in rollup_distinct(sk, ("event_type",)).collect()
    }
    exact_type = _exact(spark, "event_type")
    for k, n in exact_type.items():
        assert abs(by_type[k[0]] - n) <= max(2, 0.05 * n), k
    total = rollup_distinct(sk, ()).collect()[0]["n_distinct"]
    exact_total = _exact(spark)
    assert abs(total - exact_total) <= max(2, 0.05 * exact_total)


def test_sketch_column_survives_parquet(spark, tmp_path):
    sk = distinct_sketches(_events(spark), ("event_type",), "user_id")
    path = str(tmp_path / "sk")
    sk.write.mode("overwrite").parquet(path)
    re_read = spark.read.parquet(path)
    a = {
        r["event_type"]: r["n_distinct"]
        for r in rollup_distinct(sk, ("event_type",)).collect()
    }
    b = {
        r["event_type"]: r["n_distinct"]
        for r in rollup_distinct(re_read, ("event_type",)).collect()
    }
    assert a == b


def test_deterministic_and_layout_invariant(spark):
    ev = _events(spark)
    a = rollup_distinct(
        distinct_sketches(ev, ("event_type",), "user_id"), ()
    ).collect()[0]["n_distinct"]
    b = rollup_distinct(
        distinct_sketches(ev.repartition(11), ("event_type",), "user_id"),
        (),
    ).collect()[0]["n_distinct"]
    assert a == b
    with pytest.raises(ValueError, match="group_cols"):
        distinct_sketches(ev, (), "user_id")
