"""interval_join_stream — stream-stream binned range join
(operators/joins.py, round 11).

Contract under test:
* batch ≡ stream: the SAME call runs on batch frames (withWatermark
  is a no-op) and on two real file streams — identical result sets,
  with and without equi-keys (the no-equi-key case is the new
  capability: the bin key is what keeps state distributed);
* state EVICTION: with watermarks advancing across micro-batches, the
  join's state-store row count goes down — the max_span bound in the
  join condition is read by Spark, not decorative;
* intervals longer than max_span fail LOUDLY in-plan;
* validation: numeric columns rejected (watermarks are event-time
  machinery), collisions/reserved names rejected.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.joins import interval_join_stream

T0 = datetime(2024, 1, 1, 0, 0)


def _t(minutes):
    return T0 + timedelta(minutes=minutes)


P_SCHEMA = "point_id long, key long, ts timestamp"
I_SCHEMA = "iv_id long, key long, s timestamp, e timestamp"

POINTS = [
    (1, 100, _t(5)),
    (2, 100, _t(45)),
    (3, 200, _t(10)),
    (4, 200, _t(70)),
    (5, 100, _t(130)),
]
INTERVALS = [
    (10, 100, _t(0), _t(30)),       # catches point 1
    (11, 100, _t(40), _t(60)),      # catches point 2
    (12, 200, _t(0), _t(80)),       # catches points 3, 4
    (13, 100, _t(120), _t(121)),    # 1-minute interval, catches nothing
    (14, 100, _t(125), _t(140)),    # catches point 5
]
EXPECTED = {(1, 10), (2, 11), (3, 12), (4, 12), (5, 14)}
KW = dict(
    point_ts="ts", start_col="s", end_col="e",
    bin_width=600.0, max_span=7200.0,
    points_watermark="10 minutes", intervals_watermark="10 minutes",
)


def _pairs(df):
    return {(r["point_id"], r["iv_id"]) for r in df.collect()}


def _stream_result(spark, tmp_path, on, points=POINTS, intervals=INTERVALS,
                   name="ijs"):
    pdir, idir = str(tmp_path / "pts"), str(tmp_path / "ivs")
    pb = spark.createDataFrame(points, P_SCHEMA)
    ib = spark.createDataFrame(intervals, I_SCHEMA)
    pb.write.mode("overwrite").parquet(pdir)
    ib.write.mode("overwrite").parquet(idir)
    ps = spark.readStream.schema(pb.schema).parquet(pdir)
    ivs = spark.readStream.schema(ib.schema).parquet(idir)
    out = interval_join_stream(ps, ivs, on=on, **KW)
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_batch_equals_stream_with_key(spark, tmp_path):
    batch = interval_join_stream(
        spark.createDataFrame(POINTS, P_SCHEMA),
        spark.createDataFrame(INTERVALS, I_SCHEMA),
        on=("key",), **KW,
    )
    assert _pairs(batch) == EXPECTED
    got = _stream_result(spark, tmp_path, on=("key",), name="ijs_key")
    assert _pairs(got) == EXPECTED


def test_batch_equals_stream_pure_range_no_equi_key(spark, tmp_path):
    """No equi key at all — the bin IS the distribution key. The
    result is the pure range semantics (key columns ignored)."""
    pts = [(i, k, ts) for i, k, ts in POINTS]
    want = {
        (p, i)
        for p, _, ts in pts
        for i, _, s, e in INTERVALS
        if s <= ts < e
    }
    batch = interval_join_stream(
        spark.createDataFrame(POINTS, P_SCHEMA).drop("key"),
        spark.createDataFrame(INTERVALS, I_SCHEMA).withColumnRenamed(
            "key", "iv_key"
        ),
        on=(), **KW,
    )
    assert _pairs(batch) == want
    pdir, idir = str(tmp_path / "p2"), str(tmp_path / "i2")
    pb = spark.createDataFrame(POINTS, P_SCHEMA).drop("key")
    ib = spark.createDataFrame(INTERVALS, I_SCHEMA).withColumnRenamed(
        "key", "iv_key"
    )
    pb.write.parquet(pdir)
    ib.write.parquet(idir)
    out = interval_join_stream(
        spark.readStream.schema(pb.schema).parquet(pdir),
        spark.readStream.schema(ib.schema).parquet(idir),
        on=(), **KW,
    )
    q = (
        out.writeStream.format("memory").queryName("ijs_nokey")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert _pairs(spark.sql("SELECT * FROM ijs_nokey")) == want


def test_state_eviction_under_advancing_watermark(spark, tmp_path):
    """Feed three micro-batches whose event times march forward; the
    join's state rows must SHRINK once the watermark passes old rows'
    eviction bounds — proof Spark reads the max_span bound from the
    condition (unbounded state would only ever grow)."""
    pdir, idir = str(tmp_path / "p3"), str(tmp_path / "i3")
    kw = dict(KW)
    kw.update(points_watermark="1 minute", intervals_watermark="1 minute")

    def pts(base, n=30):
        return [(base * 1000 + i, 100, _t(base + i)) for i in range(n)]

    def ivs(base):
        return [(base * 1000, 100, _t(base), _t(base + 10))]

    pb = spark.createDataFrame(pts(0), P_SCHEMA)
    ib = spark.createDataFrame(ivs(0), I_SCHEMA)
    pb.write.parquet(pdir)
    ib.write.parquet(idir)
    out = interval_join_stream(
        spark.readStream.schema(pb.schema).option("maxFilesPerTrigger", 1)
        .parquet(pdir),
        spark.readStream.schema(ib.schema).option("maxFilesPerTrigger", 1)
        .parquet(idir),
        on=("key",), **kw,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory").queryName("ijs_evict")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds").start()
        )
        try:
            q.processAllAvailable()
            # much later data → watermark advances far past batch 1
            spark.createDataFrame(pts(600), P_SCHEMA).write.mode(
                "append"
            ).parquet(pdir)
            spark.createDataFrame(ivs(600), I_SCHEMA).write.mode(
                "append"
            ).parquet(idir)
            q.processAllAvailable()
            spark.createDataFrame(pts(1200), P_SCHEMA).write.mode(
                "append"
            ).parquet(pdir)
            spark.createDataFrame(ivs(1200), I_SCHEMA).write.mode(
                "append"
            ).parquet(idir)
            q.processAllAvailable()
            progress = [
                p for p in q.recentProgress
                if p["stateOperators"]
                and p["stateOperators"][0]["numRowsTotal"] > 0
            ]
            totals = [
                p["stateOperators"][0]["numRowsTotal"] for p in progress
            ]
            removed = sum(
                p["stateOperators"][0].get("numRowsRemoved", 0)
                for p in progress
            )
        finally:
            q.stop()
    # rows were evicted, and the final state is smaller than the
    # running peak (state did not grow monotonically)
    assert removed > 0, totals
    assert totals[-1] < max(totals), totals


def test_overlong_interval_raises_in_plan(spark):
    p = spark.createDataFrame(POINTS, P_SCHEMA)
    iv = spark.createDataFrame(
        [(99, 100, _t(0), _t(0) + timedelta(seconds=7201))], I_SCHEMA
    )
    out = interval_join_stream(p, iv, on=("key",), **KW)
    with pytest.raises(Exception, match="max_span"):
        out.collect()


def test_validation(spark):
    p = spark.createDataFrame(POINTS, P_SCHEMA)
    iv = spark.createDataFrame(INTERVALS, I_SCHEMA)
    with pytest.raises(TypeError, match="time-typed"):
        interval_join_stream(
            spark.createDataFrame([(1, 1.0)], "point_id long, ts double"),
            spark.createDataFrame(
                [(1, 0.0, 2.0)], "iv_id long, s double, e double"
            ),
            point_ts="ts", start_col="s", end_col="e",
        )
    with pytest.raises(ValueError, match="collide"):
        interval_join_stream(
            p, iv.withColumnRenamed("iv_id", "point_id"),
            on=("key",), **KW,
        )
    with pytest.raises(ValueError, match="max_span"):
        interval_join_stream(
            p, iv, point_ts="ts", start_col="s", end_col="e",
            max_span=0.0,
        )


def test_left_outer_batch_keeps_unmatched_points(spark):
    out = interval_join_stream(
        spark.createDataFrame(POINTS, P_SCHEMA),
        spark.createDataFrame(INTERVALS, I_SCHEMA),
        on=("key",), how="left_outer", **KW,
    )
    rows = {r["point_id"]: r["iv_id"] for r in out.collect()}
    # matched points carry their interval; every point appears
    assert rows == {1: 10, 2: 11, 3: 12, 4: 12, 5: 14}
    # a point with no interval at all (no key match) survives with null
    lonely = spark.createDataFrame(
        [(9, 999, _t(5))], P_SCHEMA
    )
    out2 = interval_join_stream(
        lonely, spark.createDataFrame(INTERVALS, I_SCHEMA),
        on=("key",), how="left_outer", **KW,
    )
    got = out2.collect()
    assert len(got) == 1 and got[0]["iv_id"] is None
    with pytest.raises(ValueError, match="how"):
        interval_join_stream(
            lonely, spark.createDataFrame(INTERVALS, I_SCHEMA),
            on=("key",), how="full", **KW,
        )


def test_left_outer_stream_emits_nulls_after_watermark(spark, tmp_path):
    """Streaming outer rows emit once the watermark proves no future
    interval can match: feed a batch with an unmatched point, then a
    much-later batch to advance the watermark — the null row appears."""
    import tempfile

    pdir, idir = str(tmp_path / "p4"), str(tmp_path / "i4")
    kw = dict(KW)
    kw.update(points_watermark="1 minute", intervals_watermark="1 minute")
    p1 = [(1, 100, _t(5)), (2, 100, _t(200))]       # 2 has no interval
    i1 = [(10, 100, _t(0), _t(30))]
    spark.createDataFrame(p1, P_SCHEMA).write.parquet(pdir)
    spark.createDataFrame(i1, I_SCHEMA).write.parquet(idir)
    out = interval_join_stream(
        spark.readStream.schema(
            spark.createDataFrame(p1, P_SCHEMA).schema
        ).option("maxFilesPerTrigger", 1).parquet(pdir),
        spark.readStream.schema(
            spark.createDataFrame(i1, I_SCHEMA).schema
        ).option("maxFilesPerTrigger", 1).parquet(idir),
        on=("key",), how="left_outer", **kw,
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory").queryName("ijs_outer")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds").start()
        )
        try:
            q.processAllAvailable()
            # far-future data on both sides → watermark sails past p1/i1
            spark.createDataFrame(
                [(3, 100, _t(5000))], P_SCHEMA
            ).write.mode("append").parquet(pdir)
            spark.createDataFrame(
                [(11, 100, _t(5000), _t(5010))], I_SCHEMA
            ).write.mode("append").parquet(idir)
            q.processAllAvailable()
            q.processAllAvailable()
            got = {
                (r["point_id"], r["iv_id"])
                for r in spark.sql("SELECT * FROM ijs_outer").collect()
            }
        finally:
            q.stop()
    assert (1, 10) in got            # matched, emitted eagerly
    assert (2, None) in got          # unmatched, emitted on watermark
