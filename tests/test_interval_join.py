"""interval_join — binned range-join rewrite (operators/joins.py).

The contract under test:

* result set EQUALS the declarative theta join ``s <= ts < e`` (with
  and without equi-keys) for every bin width — the rewrite is an
  optimization, never a semantics change;
* the physical plan is an EQUI-join: no BroadcastNestedLoopJoin, no
  CartesianProduct — the entire point at scale;
* boundary semantics closed-open (ts == s in, ts == e out);
* empty / null-bounded intervals and null timestamps match nothing;
* an interval spanning more than max_bins_per_interval bins fails
  LOUDLY at runtime (lazy raise_error, no silent blowup);
* numeric (non-time) columns bin by plain units.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.joins import interval_join


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (1, 100, _ts(0, 0)),
        (2, 100, _ts(0, 30)),
        (3, 100, _ts(1, 0)),
        (4, 200, _ts(5, 0)),
        (5, 200, _ts(7, 59, 59)),
        (6, 300, _ts(12, 0)),
        (7, None, _ts(1, 0)),
        (8, 100, None),
    ]
    return spark.createDataFrame(
        rows, "point_id long, key long, ts timestamp_ntz"
    )


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        (10, 100, _ts(0, 0), _ts(1, 0)),     # [00:00, 01:00)
        (11, 100, _ts(0, 45), _ts(2, 0)),    # overlapping second window
        (12, 200, _ts(4, 0), _ts(8, 0)),     # 4h span
        (13, 300, _ts(12, 0), _ts(12, 0)),   # empty: e == s
        (14, 300, _ts(13, 0), _ts(12, 0)),   # inverted
        (15, 300, None, _ts(13, 0)),         # null start
        (16, None, _ts(0, 0), _ts(23, 0)),   # null key
    ]
    return spark.createDataFrame(
        rows, "iv_id long, key long, s timestamp_ntz, e timestamp_ntz"
    )


def _naive(points, intervals, on=("key",)):
    iv = intervals
    for k in on:
        iv = iv.withColumnRenamed(k, f"__iv_{k}")
    cond = (F.col("s") <= F.col("ts")) & (F.col("ts") < F.col("e"))
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__iv_{k}"))
    pairs = points.join(iv, cond)
    return sorted(
        (r["point_id"], r["iv_id"]) for r in pairs.collect()
    )


def _got(points, intervals, **kw):
    out = interval_join(
        points, intervals, point_ts="ts", start_col="s", end_col="e", **kw
    )
    return sorted((r["point_id"], r["iv_id"]) for r in out.collect())


def test_matches_naive_theta_join(points, intervals):
    want = _naive(points, intervals)
    for width in (60.0, 900.0, 3600.0, 86400.0):
        assert _got(points, intervals, on=("key",), bin_width=width) == want


def test_boundary_closed_open(points, intervals):
    got = _got(points, intervals, on=("key",), bin_width=3600.0)
    # point 1 at exactly s of interval 10 → in; point 3 at exactly
    # e of interval 10 → out (but inside interval 11)
    assert (1, 10) in got
    assert (3, 10) not in got
    assert (3, 11) in got


def test_nulls_and_empty_intervals_match_nothing(points, intervals):
    got = _got(points, intervals, on=("key",), bin_width=3600.0)
    ids = {p for p, _ in got} | {i for _, i in got}
    assert 7 not in ids and 8 not in ids          # null key / null ts
    assert 13 not in ids and 14 not in ids and 15 not in ids
    assert 16 not in ids                          # null equi-key


def test_no_equi_key_pure_range(spark):
    p = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0)], "point_id long, ts double"
    )
    iv = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 10.0, 30.0)], "iv_id long, s double, e double"
    )
    got = _got(p, iv, on=(), bin_width=4.0)
    assert got == [(1, 10), (2, 11), (3, 11)]


def test_plan_is_equi_join(points, intervals):
    out = interval_join(
        points, intervals, point_ts="ts", start_col="s", end_col="e",
        on=("key",), bin_width=3600.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan


def test_oversized_interval_raises_at_runtime(points, intervals):
    out = interval_join(
        points, intervals, point_ts="ts", start_col="s", end_col="e",
        on=("key",), bin_width=60.0, max_bins_per_interval=3,
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        out.collect()


def test_column_collision_rejected(points, intervals):
    bad = intervals.withColumnRenamed("iv_id", "point_id")
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            points, bad, point_ts="ts", start_col="s", end_col="e",
            on=("key",),
        )


def test_bad_params_rejected(points, intervals):
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(
            points, intervals, point_ts="ts", start_col="s",
            end_col="e", bin_width=0.0,
        )
    with pytest.raises(ValueError, match="max_bins_per_interval"):
        interval_join(
            points, intervals, point_ts="ts", start_col="s",
            end_col="e", max_bins_per_interval=0,
        )


def test_layout_invariance(points, intervals):
    want = _got(points, intervals, on=("key",), bin_width=900.0)
    got = _got(
        points.repartition(7), intervals.repartition(3),
        on=("key",), bin_width=900.0,
    )
    assert got == want


def test_streaming_points_match_batch(spark, tmp_path):
    """interval_join works UNCHANGED on a streaming points side: every
    stage on the points frame is a stateless projection and the
    interval side is a static equi-join build — a stream-static inner
    join Spark supports without watermarks. availableNow replay of
    the batch input produces exactly the batch result."""
    from datetime import datetime

    src = str(tmp_path / "pts")
    rows = [
        (1, 100, datetime(2024, 1, 1, 0, 10)),
        (2, 100, datetime(2024, 1, 1, 2, 30)),
        (3, 200, datetime(2024, 1, 1, 5, 0)),
        (4, 200, datetime(2024, 1, 1, 9, 0)),
    ]
    batch_pts = spark.createDataFrame(
        rows, "point_id long, key long, ts timestamp_ntz"
    )
    batch_pts.write.mode("overwrite").parquet(src)
    iv = spark.createDataFrame(
        [
            (10, 100, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0)),
            (11, 200, datetime(2024, 1, 1, 4, 0), datetime(2024, 1, 1, 8, 0)),
        ],
        "iv_id long, key long, s timestamp_ntz, e timestamp_ntz",
    )
    want = sorted(
        (r["point_id"], r["iv_id"])
        for r in interval_join(
            batch_pts, iv, point_ts="ts", start_col="s", end_col="e",
            on=("key",), bin_width=1800.0,
        ).collect()
    )
    stream_pts = spark.readStream.schema(batch_pts.schema).parquet(src)
    out = interval_join(
        stream_pts, iv, point_ts="ts", start_col="s", end_col="e",
        on=("key",), bin_width=1800.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ij_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["point_id"], r["iv_id"])
        for r in spark.sql("SELECT * FROM ij_stream").collect()
    )
    assert got == want and len(got) == 2


def test_numeric_large_magnitudes_bin_exactly(spark):
    """|values| > 1e13 — the old (double*1e6)→long path WRAPPED here
    and mis-binned; raw-value binning must match the theta join."""
    base = 4_000_000_000_000_0  # 4e13
    p = spark.createDataFrame(
        [(1, float(base + 5)), (2, float(base + 15)), (3, float(base + 25)),
         (4, -float(base))],
        "point_id long, ts double",
    )
    iv = spark.createDataFrame(
        [(10, float(base), float(base + 10)),
         (11, float(base + 10), float(base + 30)),
         (12, -float(base + 1), -float(base - 1))],
        "iv_id long, s double, e double",
    )
    got = _got(p, iv, on=(), bin_width=4.0)
    assert got == _naive_numeric(p, iv) == [(1, 10), (2, 11), (3, 11), (4, 12)]


def _naive_numeric(p, iv):
    pairs = p.join(iv, (F.col("s") <= F.col("ts")) & (F.col("ts") < F.col("e")))
    return sorted((r["point_id"], r["iv_id"]) for r in pairs.collect())


def test_numeric_sub_unit_boundaries(spark):
    """Sub-microsecond fractional differences must not collapse: a
    point at e - 1e-9 is IN, a point at e is OUT, even when e sits
    exactly on a bin boundary (the old micros truncation dropped the
    in-point at boundary widths)."""
    e = 8.0
    p = spark.createDataFrame(
        [(1, e - 1e-9), (2, e), (3, e - 0.5e-6)], "point_id long, ts double"
    )
    iv = spark.createDataFrame([(10, 0.0, e)], "iv_id long, s double, e double")
    for width in (1.0, 2.0, 4.0, 8.0, 0.5):
        got = _got(p, iv, on=(), bin_width=width)
        assert got == [(1, 10), (3, 10)], f"width={width}: {got}"


def test_numeric_integer_dtype(spark):
    p = spark.createDataFrame([(1, 5), (2, 99), (3, 100)], "point_id long, ts long")
    iv = spark.createDataFrame([(10, 0, 100)], "iv_id long, s long, e long")
    got = _got(p, iv, on=(), bin_width=7.0)
    assert got == [(1, 10), (2, 10)]


def test_numeric_overflow_guard_raises(spark):
    """Interval bounds whose bin id would exceed 2^62 fail loudly
    instead of wrapping into a wrong bin."""
    p = spark.createDataFrame([(1, 1.0)], "point_id long, ts double")
    iv = spark.createDataFrame(
        [(10, 0.0, 1e19)], "iv_id long, s double, e double"
    )
    out = interval_join(
        p, iv, point_ts="ts", start_col="s", end_col="e", bin_width=1.0,
        max_bins_per_interval=2**63 - 1,
    )
    with pytest.raises(Exception, match="2\\^62"):
        out.collect()


def test_mixed_time_numeric_types_rejected(spark, points):
    iv_num = spark.createDataFrame(
        [(10, 0.0, 10.0)], "iv_id long, s double, e double"
    )
    with pytest.raises(TypeError, match="mixed"):
        interval_join(points, iv_num, point_ts="ts", start_col="s", end_col="e")


def test_time_bin_width_below_resolution_rejected(points, intervals):
    with pytest.raises(ValueError, match="1µs"):
        interval_join(
            points, intervals, point_ts="ts", start_col="s", end_col="e",
            on=("key",), bin_width=1e-7,
        )
