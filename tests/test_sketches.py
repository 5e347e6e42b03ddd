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


# ------------------------------------- Misra–Gries heavy hitters --


def test_heavy_hitters_exact_when_under_capacity(spark):
    """distinct items ≤ capacity ⇒ zero decrements: every item comes
    back with count_lower == count_upper == the exact count."""
    from etl_data_lake_spark.operators.sketches import heavy_hitters

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {
        r.item: (r.count_lower, r.count_upper, r.n_total)
        for r in heavy_hitters(df, "item", capacity=8).collect()
    }
    assert got == {
        "a": (5, 5, 9), "b": (3, 3, 9), "c": (1, 1, 9),
    }


def test_heavy_hitters_guarantees_under_pressure(spark):
    """distinct ≫ capacity: every item with true count > Σ decrements
    is present, and every emitted bound interval contains the truth —
    under several physical layouts (Misra–Gries is order-sensitive;
    the GUARANTEES must not be)."""
    from etl_data_lake_spark.operators.sketches import heavy_hitters

    # 3 planted whales + a 500-item noise tail of singletons
    data = (
        [("whale_a",)] * 400
        + [("whale_b",)] * 250
        + [("whale_c",)] * 120
        + [(f"noise_{i}",) for i in range(500)]
    )
    true = {"whale_a": 400, "whale_b": 250, "whale_c": 120}
    for parts in (1, 7, 32):
        df = spark.createDataFrame(
            data, "item string"
        ).repartition(parts)
        out = heavy_hitters(df, "item", capacity=16).collect()
        emitted = {r.item: r for r in out}
        assert out[0].n_total == len(data)
        err = out[0].count_upper - out[0].count_lower  # Σ decrements
        # guarantee 1: anything more frequent than the error floor
        # is present
        for w, c in true.items():
            if c > err:
                assert w in emitted, (parts, err)
        # guarantee 2: every bound interval contains the truth
        for r in out:
            t = true.get(r.item, 1)
            assert r.count_lower <= t <= r.count_upper, (parts, r)
        # the error floor itself respects N/(capacity+1)
        assert err <= len(data) // 17 + 1


def test_heavy_hitters_topk_nulls_and_validation(spark):
    from etl_data_lake_spark.operators.sketches import heavy_hitters

    rows = [("a",)] * 4 + [("b",)] * 2 + [(None,)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "item string")
    got = heavy_hitters(df, "item", capacity=8, k=2).collect()
    assert [(r.item, r.count_lower) for r in
            sorted(got, key=lambda r: -r.count_lower)] == [
        ("a", 4), ("b", 2),
    ]
    assert all(r.n_total == 7 for r in got)  # nulls never counted
    import pytest as _pytest

    with _pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "item", capacity=0)
    with _pytest.raises(ValueError, match="k must"):
        heavy_hitters(df, "item", k=0)
    ints = spark.createDataFrame([(1,)], "item bigint")
    with _pytest.raises(ValueError, match="string column"):
        heavy_hitters(ints, "item")


def test_heavy_hitters_single_plan_shape(spark):
    """The scan feeds ONE MapInPandas and the merge shuffles summary
    rows only — no second pass over the data lineage."""
    from etl_data_lake_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("x",)] * 10, "item string")
    plan = (
        heavy_hitters(df, "item")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1


def test_heavy_hitters_sink_exactly_once_and_bounds(spark, tmp_path):
    """Streaming MG maintenance: batches fold into one persisted
    state; bounds contain the all-time truth and everything above the
    accumulated error is present; a replayed micro-batch no-ops."""
    from etl_data_lake_spark.operators.sketches import (
        heavy_hitters_sink,
        read_heavy_hitters,
    )
    from etl_data_lake_spark.sources.txn import TxnTable

    path = str(tmp_path / "mg")
    fn = heavy_hitters_sink(spark, path, "item", capacity=16)
    b1 = (
        [("whale_a",)] * 200
        + [(f"n1_{i}",) for i in range(150)]
        + [("whale_b",)] * 90
    )
    b2 = (
        [("whale_a",)] * 100
        + [(f"n2_{i}",) for i in range(150)]
        + [("whale_c",)] * 130
    )
    fn(spark.createDataFrame(b1, "item string").repartition(5), 0)
    fn(spark.createDataFrame(b2, "item string").repartition(3), 1)
    true = {"whale_a": 300, "whale_b": 90, "whale_c": 130}
    out = read_heavy_hitters(spark, path).collect()
    assert out and all(r.n_total == len(b1) + len(b2) for r in out)
    err = out[0].count_upper - out[0].count_lower
    emitted = {r.item: r for r in out}
    for w, c in true.items():
        if c > err:
            assert w in emitted
    for r in out:
        t = true.get(r.item, 1)
        assert r.count_lower <= t <= r.count_upper
    # replayed micro-batch: the commit no-ops — state version AND
    # content unchanged
    tbl = TxnTable(spark, path)
    v = tbl.latest_version()
    key = lambda t: (t[0] is None, t[0] or "", t[1:])
    before = sorted(map(tuple, tbl.snapshot().collect()), key=key)
    fn(spark.createDataFrame(b2, "item string").repartition(3), 1)
    assert tbl.latest_version() == v
    after = sorted(map(tuple, tbl.snapshot().collect()), key=key)
    assert after == before
    # a fresh handle reads the same state
    again = {
        r.item: (r.count_lower, r.count_upper)
        for r in read_heavy_hitters(spark, path).collect()
    }
    assert again == {
        r.item: (r.count_lower, r.count_upper) for r in out
    }


def test_heavy_hitters_sink_matches_batch_when_exact(spark, tmp_path):
    """Under-capacity streams never decrement: the streamed state is
    EXACT and equal to the batch operator over the concatenation."""
    from etl_data_lake_spark.operators.sketches import (
        heavy_hitters,
        heavy_hitters_sink,
        read_heavy_hitters,
    )

    path = str(tmp_path / "mg")
    fn = heavy_hitters_sink(spark, path, "item", capacity=32)
    b1 = [("a",)] * 5 + [("b",)] * 2
    b2 = [("a",)] * 1 + [("c",)] * 4
    fn(spark.createDataFrame(b1, "item string"), 0)
    fn(spark.createDataFrame(b2, "item string"), 1)
    got = sorted(
        (r.item, r.count_lower, r.count_upper)
        for r in read_heavy_hitters(spark, path).collect()
    )
    both = spark.createDataFrame(b1 + b2, "item string")
    want = sorted(
        (r.item, r.count_lower, r.count_upper)
        for r in heavy_hitters(both, "item", capacity=32).collect()
    )
    assert got == want == [("a", 6, 6), ("b", 2, 2), ("c", 4, 4)]
    # top-k read
    from etl_data_lake_spark.operators.sketches import read_heavy_hitters as rh

    top = rh(spark, path, k=1).collect()
    assert [(r.item, r.count_lower) for r in top] == [("a", 6)]


def test_distinct_sketch_sink_exactly_once(spark, tmp_path):
    """Streamed per-group sketches answer within HLL tolerance of the
    true all-time distinct counts (a merged estimate may differ
    slightly from a from-scratch union sketch — the module docstring's
    representation-change caveat, so pins are vs TRUTH, not vs the
    direct sketch); replayed batches no-op."""
    from etl_data_lake_spark.operators.sketches import (
        distinct_sketch_sink,
        rollup_distinct,
    )
    from etl_data_lake_spark.sources.txn import TxnTable

    path = str(tmp_path / "hll")
    fn = distinct_sketch_sink(spark, path, ("src",), "uid", lg_k=12)
    b1 = [("a", i) for i in range(300)] + [("b", i) for i in range(50)]
    b2 = [("a", i) for i in range(200, 500)] + [("c", i) for i in range(40)]
    fn(spark.createDataFrame(b1, "src string, uid long"), 0)
    fn(spark.createDataFrame(b2, "src string, uid long"), 1)
    tbl = TxnTable(spark, path)
    got = {
        r["src"]: r["n_distinct"]
        for r in rollup_distinct(tbl.snapshot(), ("src",)).collect()
    }
    assert set(got) == {"a", "b", "c"}
    true = {"a": 500, "b": 50, "c": 40}
    for s, n in true.items():
        assert abs(got[s] - n) <= max(2, 0.05 * n)
    # replay no-op
    v = tbl.latest_version()
    fn(spark.createDataFrame(b2, "src string, uid long"), 1)
    assert tbl.latest_version() == v


# ------------------------------------------------------------------ CMS


def _cms_rows(state):
    return sorted(map(tuple, state.collect()))


def test_cms_exact_when_sparse_and_never_undercounts(spark):
    """At width 2048 a 60-distinct corpus is collision-free for
    practical purposes: every estimate equals the true count exactly;
    and the one-sided contract (est >= true) holds item by item."""
    from etl_data_lake_spark.operators.sketches import (
        cms_collect,
        cms_sketch,
    )

    rows, true = [], {}
    for i in range(60):
        c = (i % 7) + 1
        true[f"item_{i}"] = c
        rows += [(f"item_{i}",)] * c
    rows.append((None,))  # nulls are ignored
    df = spark.createDataFrame(rows, "item string").repartition(6)
    reader = cms_collect(cms_sketch(df, "item"))
    assert reader.n_total == sum(true.values())
    for item, c in true.items():
        assert reader.estimate(item) == c
    # an absent item can only collide upward, never report negative
    assert 0 <= reader.estimate("never_seen") <= reader.n_total


def test_cms_one_sided_under_adversarial_width(spark):
    """width=2, depth=1 forces collisions everywhere: estimates still
    NEVER undercount (the defining guarantee) and never exceed n."""
    from etl_data_lake_spark.operators.sketches import (
        cms_collect,
        cms_sketch,
    )

    true = {"a": 50, "b": 30, "c": 15, "d": 5}
    rows = [(k,) for k, c in true.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    reader = cms_collect(
        cms_sketch(df, "item", width=2, depth=1),
        width=2,
        depth=1,
    )
    for k, c in true.items():
        est = reader.estimate(k)
        assert c <= est <= reader.n_total


def test_cms_state_is_layout_canonical(spark):
    """Counter addition commutes: any partitioning yields the
    bit-identical sparse state (unlike Misra-Gries, where only the
    bounds are layout-stable)."""
    from etl_data_lake_spark.operators.sketches import cms_sketch

    rows = [(f"k{i % 37}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string")
    a = _cms_rows(cms_sketch(df.repartition(1), "item", width=64, depth=3))
    b = _cms_rows(cms_sketch(df.repartition(13), "item", width=64, depth=3))
    assert a == b


def test_cms_merge_is_exact(spark):
    """cms(A) + cms(B) == cms(A concat B), counter for counter."""
    from etl_data_lake_spark.operators.sketches import cms_merge, cms_sketch

    a_rows = [(f"a{i % 11}",) for i in range(200)]
    b_rows = [(f"a{i % 17}",) for i in range(150)]
    a = spark.createDataFrame(a_rows, "item string")
    b = spark.createDataFrame(b_rows, "item string")
    both = spark.createDataFrame(a_rows + b_rows, "item string")
    kw = dict(width=128, depth=4, seed=7)
    merged = cms_merge(
        cms_sketch(a, "item", **kw), cms_sketch(b, "item", **kw)
    )
    assert _cms_rows(merged) == _cms_rows(cms_sketch(both, "item", **kw))


def test_cms_estimate_col_broadcast_scoring(spark):
    """Scoring a candidate table against the sketch: estimates match
    the driver reader exactly, nulls pass through as null, and the
    corpus is never touched (the reader is closure state)."""
    from etl_data_lake_spark.operators.sketches import (
        cms_collect,
        cms_estimate_col,
        cms_sketch,
    )

    corpus = spark.createDataFrame(
        [(f"w{i % 9}",) for i in range(300)], "item string"
    )
    reader = cms_collect(cms_sketch(corpus, "item"))
    cand = spark.createDataFrame(
        [("w0",), ("w8",), ("missing",), (None,)], "item string"
    )
    got = {
        r["item"]: r["cms_estimate"]
        for r in cms_estimate_col(cand, "item", reader).collect()
    }
    assert got["w0"] == reader.estimate("w0") > 0
    assert got["w8"] == reader.estimate("w8") > 0
    assert got["missing"] == reader.estimate("missing")
    assert got[None] is None


def test_cms_validation(spark):
    from etl_data_lake_spark.operators.sketches import (
        cms_collect,
        cms_sketch,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "x int")
    with _pytest.raises(ValueError, match="string column"):
        cms_sketch(df, "x")
    s = spark.createDataFrame([("a",)], "item string")
    with _pytest.raises(ValueError, match="width"):
        cms_sketch(s, "item", width=1)
    with _pytest.raises(ValueError, match="depth"):
        cms_sketch(s, "item", depth=0)
    # params that don't match the sketch fail loudly on collect
    state = cms_sketch(s, "item", width=2048, depth=4)
    with _pytest.raises(ValueError, match="params"):
        cms_collect(state, width=16, depth=4)


def test_cms_sink_exactly_once_and_equals_batch(spark, tmp_path):
    """The folded streaming state IS the from-scratch sketch of the
    whole history (merge is exact), and a replayed micro-batch
    no-ops."""
    from etl_data_lake_spark.operators.sketches import (
        cms_sink,
        cms_sketch,
        read_cms,
    )
    from etl_data_lake_spark.sources.txn import TxnTable

    path = str(tmp_path / "cms")
    kw = dict(width=256, depth=3, seed=3)
    fn = cms_sink(spark, path, "item", **kw)
    b1 = [(f"x{i % 5}",) for i in range(120)]
    b2 = [(f"x{i % 8}",) for i in range(80)]
    fn(spark.createDataFrame(b1, "item string").repartition(4), 0)
    fn(spark.createDataFrame(b2, "item string").repartition(2), 1)
    tbl = TxnTable(spark, path)
    whole = cms_sketch(
        spark.createDataFrame(b1 + b2, "item string"), "item", **kw
    )
    assert _cms_rows(tbl.snapshot()) == _cms_rows(whole)
    # replay: version and content unchanged
    v = tbl.latest_version()
    before = _cms_rows(tbl.snapshot())
    fn(spark.createDataFrame(b2, "item string").repartition(2), 1)
    assert tbl.latest_version() == v
    assert _cms_rows(tbl.snapshot()) == before
    reader = read_cms(spark, path, **kw)
    assert reader.n_total == 200
    assert reader.estimate("x0") >= 120 // 5 + 80 // 8


# ---------------------------------------------------------------------------
# distinct_overlap — HLL inclusion-exclusion set overlap (round 10 s2)
# ---------------------------------------------------------------------------


def test_distinct_overlap_global_accuracy(spark):
    a = spark.range(0, 10_000).select(F.col("id").alias("k"))
    b = spark.range(5_000, 15_000).select(F.col("id").alias("k"))
    from etl_data_lake_spark.operators.sketches import distinct_overlap

    row = distinct_overlap(a, b, "k").collect()[0]
    assert abs(row["n_a"] - 10_000) <= 0.05 * 10_000
    assert abs(row["n_b"] - 10_000) <= 0.05 * 10_000
    assert abs(row["n_union"] - 15_000) <= 0.05 * 15_000
    # overlap error is relative to the UNION (the documented honesty)
    assert abs(row["n_overlap"] - 5_000) <= 0.05 * 15_000


def test_distinct_overlap_identical_and_disjoint(spark):
    from etl_data_lake_spark.operators.sketches import distinct_overlap

    a = spark.range(0, 4_000).select(F.col("id").alias("k"))
    same = distinct_overlap(a, a, "k").collect()[0]
    assert abs(same["n_overlap"] - 4_000) <= 0.05 * 4_000
    b = spark.range(100_000, 104_000).select(F.col("id").alias("k"))
    disj = distinct_overlap(a, b, "k").collect()[0]
    assert disj["n_overlap"] <= 0.05 * 8_000  # ≈0, clamped at 0
    assert disj["n_overlap"] >= 0


def test_distinct_overlap_grouped_and_one_sided_groups(spark):
    from etl_data_lake_spark.operators.sketches import distinct_overlap

    a = spark.createDataFrame(
        [("x", i) for i in range(1000)] + [("only_a", i) for i in range(50)],
        "g string, k long",
    )
    b = spark.createDataFrame(
        [("x", i) for i in range(500, 1500)]
        + [("only_b", i) for i in range(70)],
        "g string, k long",
    )
    rows = {
        r["g"]: r
        for r in distinct_overlap(a, b, "k", group_cols=("g",)).collect()
    }
    assert set(rows) == {"x", "only_a", "only_b"}
    assert abs(rows["x"]["n_overlap"] - 500) <= 0.05 * 1500 + 2
    assert rows["only_a"]["n_b"] == 0 and rows["only_a"]["n_overlap"] == 0
    assert rows["only_b"]["n_a"] == 0 and rows["only_b"]["n_overlap"] == 0


# ---------------------------------------------------------------------------
# q-digest mergeable quantile sketch (round 10 s2)
# ---------------------------------------------------------------------------


def _qd_check(values, reader, qs=(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """The guarantee: the reported quantile's true-rank span comes
    within rank_error_bound of the target rank."""
    import numpy as np

    v = np.sort(np.asarray(values))
    n = len(v)
    assert reader.n_total == n
    bound = reader.rank_error_bound
    for q in qs:
        ans = reader.quantile(q)
        target = max(1, int(np.ceil(q * n)))
        r_le = int(np.searchsorted(v, ans, side="right"))
        r_lt = int(np.searchsorted(v, ans, side="left"))
        assert r_le >= target - bound, (q, ans, r_le, target, bound)
        assert r_lt + 1 <= target + bound, (q, ans, r_lt, target, bound)


def test_qdigest_exact_below_compression_threshold(spark):
    from etl_data_lake_spark.operators.sketches import (
        qdigest_collect,
        qdigest_sketch,
    )

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    st = qdigest_sketch(df, "x", k=256, universe_bits=8)
    reader = qdigest_collect(st, k=256, universe_bits=8)
    assert reader.rank_error_bound == 0
    import numpy as np

    v = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 1.0):
        target = max(1, int(np.ceil(q * len(v))))
        assert reader.quantile(q) == v[target - 1], q


def test_qdigest_guarantee_across_layouts_and_k(spark):
    import numpy as np

    from etl_data_lake_spark.operators.sketches import (
        qdigest_collect,
        qdigest_sketch,
    )

    rng = np.random.default_rng(13)
    # zipf-ish head + uniform tail — both mass shapes
    vals = np.concatenate(
        [rng.zipf(1.5, 6000).clip(0, 65000), rng.integers(0, 65536, 6000)]
    ).astype(int)
    df0 = spark.createDataFrame([(int(v),) for v in vals], "x long")
    for k in (64, 256):
        for parts in (1, 7, 32):
            st = qdigest_sketch(df0.repartition(parts), "x", k=k, universe_bits=16)
            reader = qdigest_collect(st, k=k, universe_bits=16)
            _qd_check(vals, reader)
            # the state is digest-sized, never value-sized
            assert st.count() <= 3 * k * parts + parts + 16


def test_qdigest_merge_preserves_guarantee(spark):
    import numpy as np

    from etl_data_lake_spark.operators.sketches import (
        qdigest_collect,
        qdigest_merge,
        qdigest_sketch,
    )

    rng = np.random.default_rng(29)
    a = rng.integers(0, 1024, 4000)
    b = rng.integers(512, 2048, 3000)
    da = qdigest_sketch(
        spark.createDataFrame([(int(v),) for v in a], "x long"),
        "x", k=128, universe_bits=11,
    )
    db = qdigest_sketch(
        spark.createDataFrame([(int(v),) for v in b], "x long"),
        "x", k=128, universe_bits=11,
    )
    merged = qdigest_merge(da, db)
    reader = qdigest_collect(merged, k=128, universe_bits=11)
    _qd_check(np.concatenate([a, b]), reader)


def test_qdigest_validation(spark):
    import pytest

    from etl_data_lake_spark.operators.sketches import (
        qdigest_collect,
        qdigest_sketch,
    )

    df = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="integer column"):
        qdigest_sketch(df, "x")
    big = spark.createDataFrame([(300,)], "x long")
    st = qdigest_sketch(big, "x", k=16, universe_bits=8)
    with pytest.raises(Exception, match="outside"):
        st.collect()
    empty = spark.createDataFrame([], "x long")
    r = qdigest_collect(
        qdigest_sketch(empty, "x", k=16, universe_bits=8),
        k=16, universe_bits=8,
    )
    with pytest.raises(ValueError, match="empty digest"):
        r.quantile(0.5)
    ok = qdigest_sketch(
        spark.createDataFrame([(5,)], "x long"), "x", k=16, universe_bits=8
    )
    with pytest.raises(ValueError, match="universe_bits"):
        qdigest_collect(ok, k=16, universe_bits=2)


def test_qdigest_sink_exactly_once_and_bounded_state(spark, tmp_path):
    import numpy as np

    from etl_data_lake_spark.operators.sketches import (
        qdigest_sink,
        read_qdigest,
    )
    from etl_data_lake_spark.sources.txn import TxnTable

    rng = np.random.default_rng(41)
    path = str(tmp_path / "qd")
    kw = dict(k=128, universe_bits=12)
    fn = qdigest_sink(spark, path, "x", **kw)
    batches = [rng.integers(0, 4096, 1500) for _ in range(3)]
    for i, b in enumerate(batches):
        fn(spark.createDataFrame([(int(v),) for v in b], "x long").repartition(3), i)
    tbl = TxnTable(spark, path)
    # replay no-ops (version + content)
    v = tbl.latest_version()
    before = sorted(map(tuple, tbl.snapshot().collect()))
    fn(spark.createDataFrame([(int(x),) for x in batches[2]], "x long"), 2)
    assert tbl.latest_version() == v
    assert sorted(map(tuple, tbl.snapshot().collect())) == before
    # guarantee over the whole history; state stays digest-sized
    reader = read_qdigest(spark, path, **kw)
    _qd_check(np.concatenate(batches), reader)
    assert tbl.snapshot().count() <= 3 * kw["k"] + 13


def test_quantile_buckets_balanced_and_ordered(spark):
    import numpy as np

    from etl_data_lake_spark.operators.sketches import (
        qdigest_collect,
        qdigest_sketch,
        quantile_buckets,
    )

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 50_000, 12_000)
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    n_b = 8
    out = quantile_buckets(df, "x", n_b, k=256, universe_bits=16)
    rows = out.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    ).collect()
    by_b = {r["bucket"]: r for r in rows}
    assert set(by_b) == set(range(n_b))
    # buckets are ordered ranges: bucket i's max < bucket i+1's min
    for i in range(n_b - 1):
        assert by_b[i]["hi"] <= by_b[i + 1]["lo"]
    # balance within the digest guarantee (cuts off by ≤ bound ranks)
    reader = qdigest_collect(
        qdigest_sketch(df, "x", k=256, universe_bits=16),
        k=256, universe_bits=16,
    )
    bound = reader.rank_error_bound
    target = len(vals) / n_b
    for i in range(n_b):
        assert abs(by_b[i]["n"] - target) <= 2 * bound + 1, i


def test_quantile_buckets_nulls_and_validation(spark):
    import pytest

    from etl_data_lake_spark.operators.sketches import quantile_buckets

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (3,), (4,)], "x long"
    )
    out = quantile_buckets(df, "x", 2, universe_bits=4)
    got = {r["x"]: r["bucket"] for r in out.collect()}
    assert got[None] is None
    assert got[1] == 0 and got[4] == 1
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_buckets(df, "x", 1)
    with pytest.raises(ValueError, match="already exists"):
        quantile_buckets(df.withColumn("bucket", F.lit(1)), "x", 2)


# ---------------------------------------------------------------------------
# heavy_hitters_by — per-group Misra–Gries (round 10 s2)
# ---------------------------------------------------------------------------


def test_heavy_hitters_by_guarantees_per_group(spark):
    """The global operator's bound/presence guarantees hold WITHIN
    each group, across partition layouts; groups never bleed."""
    rows = (
        [("en", f"w{i % 7}") for i in range(700)]
        + [("en", "rare")] * 3
        + [("de", f"g{i % 4}") for i in range(400)]
        + [("de", "w0")] * 5      # same item name, other group
    )
    df0 = spark.createDataFrame(rows, "lang string, term string")
    from etl_data_lake_spark.operators.sketches import heavy_hitters_by

    true = {}
    for g, t in rows:
        true[(g, t)] = true.get((g, t), 0) + 1
    n_g = {"en": 703, "de": 405}
    for parts in (1, 5, 32):
        got = heavy_hitters_by(
            df0.repartition(parts), ("lang",), "term", capacity=5
        ).collect()
        seen = set()
        for r in got:
            key = (r["lang"], r["item"])
            seen.add(key)
            assert r["n_total"] == n_g[r["lang"]], key
            assert r["count_lower"] <= true[key] <= r["count_upper"], key
        # presence: anything above n/(capacity+1) within ITS group
        for (g, t), c in true.items():
            if c > n_g[g] / 6:
                assert (g, t) in seen, (g, t, parts)
        # no bleed: de's w0 stats never mix with en's w0
        en_w0 = [r for r in got if r["lang"] == "en" and r["item"] == "w0"]
        if en_w0:
            assert en_w0[0]["count_upper"] < 700  # not 100+5 mixed into en err range... bound sanity
            assert en_w0[0]["count_lower"] <= true[("en", "w0")]


def test_heavy_hitters_by_topk_and_exact_under_capacity(spark):
    from etl_data_lake_spark.operators.sketches import heavy_hitters_by

    rows = [("a", "x")] * 10 + [("a", "y")] * 6 + [("a", "z")] * 2 + [
        ("b", "p")
    ] * 4 + [("b", "q")] * 9
    df = spark.createDataFrame(rows, "g string, t string")
    got = heavy_hitters_by(df, ("g",), "t", capacity=16, k=2).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append((r["item"], r["count_lower"]))
    # capacity above the per-group distinct count ⇒ exact counts
    assert sorted(by_g["a"]) == [("x", 10), ("y", 6)]
    assert sorted(by_g["b"]) == [("p", 4), ("q", 9)]


def test_heavy_hitters_by_validation_and_group_guard(spark):
    import pytest

    from etl_data_lake_spark.operators.sketches import heavy_hitters_by

    df = spark.createDataFrame([("a", "x")], "g string, t string")
    with pytest.raises(ValueError, match="group_cols"):
        heavy_hitters_by(df, (), "t")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_by(df, ("g",), "t", capacity=0)
    with pytest.raises(ValueError, match="string column"):
        heavy_hitters_by(
            spark.createDataFrame([("a", 1)], "g string, t long"),
            ("g",), "t",
        )
    many = spark.createDataFrame(
        [(str(i), "x") for i in range(50)], "g string, t string"
    ).coalesce(1)
    with pytest.raises(Exception, match="distinct groups"):
        heavy_hitters_by(
            many, ("g",), "t", max_groups_per_task=10
        ).collect()
    # null group keys form their own group; null items ignored
    nulls = spark.createDataFrame(
        [(None, "x"), (None, "x"), ("a", None)], "g string, t string"
    )
    got = heavy_hitters_by(nulls, ("g",), "t", capacity=4).collect()
    assert [(r["g"], r["item"], r["count_lower"]) for r in got] == [
        (None, "x", 2)
    ]


def test_heavy_hitters_by_nan_group_keys_are_one_group(spark):
    """Regression (round-11 advice): a nullable float/double group
    column yields a fresh NaN object per row in pandas, and
    NaN != NaN — without key normalization every null-keyed row
    opened its OWN per-task state, contradicting the 'null group keys
    are kept as their own group' contract and able to trip
    max_groups_per_task on a few thousand null rows."""
    from etl_data_lake_spark.operators.sketches import heavy_hitters_by

    rows = [(None, "x")] * 3000 + [(1.5, "y")] * 5
    df = spark.createDataFrame(rows, "g double, t string").coalesce(1)
    # 3000 null keys must count as ONE group, far under the guard
    got = heavy_hitters_by(
        df, ("g",), "t", capacity=8, max_groups_per_task=100
    ).collect()
    by_g = {(r["g"], r["item"]): r["count_lower"] for r in got}
    assert by_g == {(None, "x"): 3000, (1.5, "y"): 5}


def test_heavy_hitters_by_matches_global_on_single_group(spark):
    """The per-group path must be behaviorally identical to the
    global operator (shared _mg_update): one constant group ⇒ same
    (item, bounds) set at the same capacity, even past capacity where
    the decrement rule drives the result."""
    from etl_data_lake_spark.operators.sketches import (
        heavy_hitters,
        heavy_hitters_by,
    )

    rows = [(f"w{i % 37}",) for i in range(4000)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, "t string").repartition(7)
    g = df.select(F.lit("all").alias("g"), "t")
    want = sorted(
        (r["item"], r["count_lower"], r["count_upper"])
        for r in heavy_hitters(df, "t", capacity=8).collect()
    )
    got = sorted(
        (r["item"], r["count_lower"], r["count_upper"])
        for r in heavy_hitters_by(g, ("g",), "t", capacity=8).collect()
    )
    assert got == want
