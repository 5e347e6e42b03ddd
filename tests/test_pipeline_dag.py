"""Declarative pipeline DAG (pipeline/dag.py): dependency ordering,
expectation gates (fail / drop / warn), downstream skip propagation,
atomic TxnTable publication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.pipeline.dag import Pipeline


def _mk_pipeline(bad_rows: bool):
    p = Pipeline("test")

    @p.table("raw")
    def raw(spark):
        rows = [(1, 10.0), (2, 20.0)] + ([(3, -5.0)] if bad_rows else [])
        return spark.createDataFrame(rows, "id int, amount double")

    @p.table(
        "clean",
        deps=("raw",),
        expectations=lambda: {"amount_positive": F.col("amount") > 0},
    )
    def clean(spark, raw):
        return raw

    @p.table("summary", deps=("clean",))
    def summary(spark, clean):
        return clean.agg(F.sum("amount").alias("total"))

    @p.table("unrelated")
    def unrelated(spark):
        return spark.range(3)

    return p


def test_clean_run_publishes_everything(spark):
    res = _mk_pipeline(bad_rows=False).run(spark)
    assert res.status == {
        "raw": "published",
        "clean": "published",
        "summary": "published",
        "unrelated": "published",
    }
    assert res.frames["summary"].collect()[0]["total"] == 30.0
    assert [a[:2] for a in res.audit] == [("clean", "amount_positive")]


def test_failed_gate_skips_downstream_only(spark):
    res = _mk_pipeline(bad_rows=True).run(spark)
    assert res.status == {
        "raw": "published",
        "clean": "failed",
        "summary": "skipped",
        "unrelated": "published",
    }
    assert "clean" not in res.frames and "summary" not in res.frames
    audit = {(a[0], a[1]): a[3] for a in res.audit}
    assert audit[("clean", "amount_positive")] == 1


def test_drop_mode_quarantines_and_publishes(spark):
    p = Pipeline("drop")

    @p.table("raw")
    def raw(spark):
        return spark.createDataFrame(
            [(1, 10.0), (3, -5.0)], "id int, amount double"
        )

    @p.table(
        "clean",
        deps=("raw",),
        expectations=lambda: {"amount_positive": F.col("amount") > 0},
        on_violation="drop",
    )
    def clean(spark, raw):
        return raw

    res = p.run(spark)
    assert res.status["clean"] == "published_dropped_rows"
    assert [r["id"] for r in res.frames["clean"].collect()] == [1]


def test_warn_mode_publishes_all_with_audit(spark):
    p = Pipeline("warn")

    @p.table(
        "raw",
        expectations=lambda: {"id_small": F.col("id") < 2},
        on_violation="warn",
    )
    def raw(spark):
        return spark.range(5)

    res = p.run(spark)
    assert res.status["raw"] == "published"
    assert res.frames["raw"].count() == 5
    assert res.audit[0][3] == 3  # violations audited


def test_txn_publication_is_atomic_snapshot(spark, tmp_path):
    from etl_data_lake_spark.sources.txn import TxnTable

    root = str(tmp_path / "lake")
    p = _mk_pipeline(bad_rows=False)
    res = p.run(spark, root=root, stats_cols={"raw": ("id",)})
    assert res.status["summary"] == "published"
    t = TxnTable(spark, f"{root}/summary")
    assert t.snapshot().collect()[0]["total"] == 30.0
    v_raw = TxnTable(spark, f"{root}/raw").latest_version()
    # re-run overwrites atomically: new version, same data
    p.run(spark, root=root, stats_cols={"raw": ("id",)})
    t2 = TxnTable(spark, f"{root}/raw")
    assert t2.latest_version() > v_raw
    assert sorted(r.id for r in t2.snapshot().collect()) == [1, 2]


def test_validation_cycles_and_unknown_deps(spark):
    p = Pipeline("bad")

    @p.table("a", deps=("b",))
    def a(spark, b):
        return b

    @p.table("b", deps=("a",))
    def b(spark, a):
        return a

    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)
    q = Pipeline("bad2")

    @q.table("x", deps=("nope",))
    def x(spark, nope):
        return nope

    with pytest.raises(ValueError, match="unknown"):
        q.run(spark)
    r = Pipeline("bad3")

    @r.table("y")
    def y(spark):
        return spark.range(1)

    with pytest.raises(ValueError, match="already registered"):

        @r.table("y")
        def y2(spark):
            return spark.range(1)

    with pytest.raises(ValueError, match="on_violation"):
        r.table("z", on_violation="explode")


def test_reference_star_schema_as_dag(spark):
    """The reference's whole ETL re-expressed declaratively: the five
    star-schema tables publish in dependency order with the reference's
    implicit assumptions as explicit expectations."""
    from etl_data_lake_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    p = Pipeline("star")

    @p.table("orders_src")
    def orders_src(spark):
        return load_table(spark, sf, "orders")

    @p.table("customer_src")
    def customer_src(spark):
        return load_table(spark, sf, "customer")

    @p.table(
        "fact",
        deps=("orders_src", "customer_src"),
        expectations=lambda: {
            "key_not_null": F.col("o_orderkey").isNotNull(),
            "joined": F.col("c_name").isNotNull(),
        },
    )
    def fact(spark, orders_src, customer_src):
        return orders_src.join(
            customer_src,
            orders_src.o_custkey == customer_src.c_custkey,
            "left",
        ).select("o_orderkey", "o_totalprice", "c_name")

    @p.table("by_customer", deps=("fact",))
    def by_customer(spark, fact):
        return fact.groupBy("c_name").agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("spend")
        )

    res = p.run(spark)
    assert res.status["by_customer"] == "published"
    assert res.frames["by_customer"].count() > 0


def test_unique_gate_and_drop_semantics(spark):
    p = Pipeline("uniq")

    @p.table(
        "t",
        expectations=lambda: {"pos": F.col("v") > 0},
        on_violation="drop",
        unique=(("k",),),
    )
    def t(spark):
        return spark.createDataFrame(
            [(1, 5.0), (1, 6.0), (2, -1.0)], "k int, v double"
        )

    res = p.run(spark)
    # row violation dropped AND captured; unique dirtiness audited but
    # not row-dropped (a duplicate is not one bad row)
    assert res.status["t"] == "published_dropped_rows"
    assert sorted(r["k"] for r in res.frames["t"].collect()) == [1, 1]
    assert [r["k"] for r in res.quarantined["t"].collect()] == [2]
    audit = {a[1]: a[5] for a in res.audit}
    assert audit["unique(k)"] is False and audit["pos"] is False


def test_drop_mode_publishes_quarantine_table(spark, tmp_path):
    from etl_data_lake_spark.sources.txn import TxnTable

    root = str(tmp_path / "lake")
    p = Pipeline("q")

    @p.table(
        "clean",
        expectations=lambda: {"pos": F.col("v") > 0},
        on_violation="drop",
    )
    def clean(spark):
        return spark.createDataFrame(
            [(1, 5.0), (2, -1.0)], "k int, v double"
        )

    res = p.run(spark, root=root)
    qt = TxnTable(spark, f"{root}/clean__quarantine")
    rows = qt.snapshot().collect()
    assert [r["k"] for r in rows] == [2]
    assert rows[0]["_violations"] == ["pos"]


def test_gate_validates_the_published_rows(spark):
    """A nondeterministic builder cannot sneak unvalidated rows past a
    passing audit: the gated frame is persisted, so the rows the
    expectations saw are the rows that publish (review regression)."""
    p = Pipeline("nd")

    @p.table(
        "t",
        expectations=lambda: {"keep": F.col("r") < 0.5},
        on_violation="drop",
    )
    def t(spark):
        return spark.range(2000).withColumn("r", F.rand())

    res = p.run(spark)
    out = res.frames["t"]
    a = [r["id"] for r in out.collect()]
    b = [r["id"] for r in out.collect()]
    assert a == b  # stable across consumptions
    assert out.where(F.col("r") >= 0.5).count() == 0
    dropped = res.quarantined["t"].count()
    audit = {x[1]: x[3] for x in res.audit}
    assert audit["keep"] == dropped and len(a) + dropped == 2000


def test_name_validation_and_double_decorator(spark):
    p = Pipeline("names")
    with pytest.raises(ValueError, match="identifier"):
        p.table("my-table")
    with pytest.raises(ValueError, match="identifier"):
        p.table("../escape")
    d1, d2 = p.table("y"), p.table("y")

    @d1
    def y1(spark):
        return spark.range(1)

    with pytest.raises(ValueError, match="already registered"):

        @d2
        def y2(spark):
            return spark.range(1)


def test_crashed_run_unpersists_gated_frame(spark):
    """A builder/report exception mid-run must not leave the gated
    frame pinned in the cache (review regression: the finally clause
    only unpersisted on root-mode or failed-gate paths)."""
    pipe = Pipeline("crash")

    @pipe.table("base", expectations=lambda: {"pos": F.col("x") > 0})
    def base(spark):
        return spark.range(1, 6).select(F.col("id").alias("x"))

    @pipe.table("boom", deps=("base",),
                expectations=lambda: {"pos": F.col("nope") > 0})
    def boom(spark, base):
        return base  # the bad expectation column raises at report time

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    with pytest.raises(Exception):
        pipe.run(spark)
    leaked = len(spark.sparkContext._jsc.getPersistentRDDs()) - before
    # base's in-memory gated frame legitimately stays pinned (it
    # published); boom's must have been unpersisted on the raise
    assert leaked <= 1


# ---------------------------------------------------------------------------
# Incremental refresh: the reference pipeline's DAG (songs/artists from
# song files; users/time/songplays from the log — etl.py:207-227) with
# txn-backed inputs, refreshed after a log append.
# ---------------------------------------------------------------------------


def _sparkify_pipeline(spark, calls):
    from etl_data_lake_spark.sources.txn import TxnTable  # noqa: F401

    p = Pipeline("sparkify")

    @p.table("songs", deps=("song_data",))
    def songs(spark, song_data):
        calls["songs"] += 1
        return song_data.select("song_id", "title", "artist_id").distinct()

    @p.table("artists", deps=("song_data",))
    def artists(spark, song_data):
        calls["artists"] += 1
        return song_data.select("artist_id", "artist_name").distinct()

    @p.table("users", deps=("log_data",))
    def users(spark, log_data):
        calls["users"] += 1
        w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
        win = w.partitionBy("user_id").orderBy(F.desc("ts"))
        return (
            log_data.withColumn("_rn", F.row_number().over(win))
            .where("_rn = 1")
            .select("user_id", "level")
        )

    @p.table("time_dim", deps=("log_data",))
    def time_dim(spark, log_data):
        calls["time_dim"] += 1
        return log_data.select("ts").distinct().select(
            "ts", F.hour(F.timestamp_millis("ts")).alias("hour")
        )

    @p.table(
        "songplays",
        deps=("log_data", "songs"),
        incremental_on="log_data",
        expectations=lambda: {"has_user": F.col("user_id").isNotNull()},
        on_violation="warn",
    )
    def songplays(spark, log_data, songs):
        calls["songplays"] += 1
        # content-derived id (not row_number) so delta-append ≡ rebuild
        return (
            log_data.join(
                F.broadcast(songs), log_data.song == songs.title, "left"
            )
            .select(
                F.xxhash64("user_id", "ts", "song").alias("songplay_id"),
                "user_id", "ts", "song", "song_id",
            )
        )

    return p


def _log_rows(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, song string, level string"
    )


def _seed_inputs(spark, base):
    from etl_data_lake_spark.sources.txn import TxnTable

    songs_in = TxnTable(spark, f"{base}/in_songs")
    songs_in.append(
        spark.createDataFrame(
            [("s1", "Alpha", "a1", "Ann"), ("s2", "Beta", "a2", "Bob")],
            "song_id string, title string, artist_id string, "
            "artist_name string",
        )
    )
    logs_in = TxnTable(spark, f"{base}/in_logs")
    logs_in.append(
        _log_rows(
            spark,
            [
                (1, 1_000, "Alpha", "free"),
                (2, 2_000, "Gamma", "paid"),
                (1, 3_000, "Beta", "free"),
            ],
        )
    )
    return songs_in, logs_in


def _collect_all(res, names):
    return {
        n: sorted(map(tuple, res.frames[n].collect())) for n in names
    }


def test_refresh_recomputes_only_downstream_of_changed_input(
    spark, tmp_path
):
    from collections import defaultdict

    calls = defaultdict(int)
    p = _sparkify_pipeline(spark, calls)
    _, logs_in = _seed_inputs(spark, str(tmp_path))
    p.input("song_data", f"{tmp_path}/in_songs")
    p.input("log_data", f"{tmp_path}/in_logs")
    root = str(tmp_path / "pub")

    first = p.run(spark, root=root)
    assert all(
        first.status[n] == "published"
        for n in ("songs", "artists", "users", "time_dim", "songplays")
    )
    assert calls["songs"] == 1 and calls["songplays"] == 1

    # nothing changed → everything fresh, zero builder calls
    idle = p.refresh(spark, root=root)
    assert set(idle.status.values()) == {"fresh"}
    assert calls["songs"] == 1 and calls["songplays"] == 1

    # append to the LOG input only
    logs_in.append(
        _log_rows(
            spark,
            [(3, 4_000, "Alpha", "paid"), (2, 5_000, "Beta", "paid")],
        )
    )
    ref = p.refresh(spark, root=root)
    assert ref.status["songs"] == "fresh"
    assert ref.status["artists"] == "fresh"
    assert ref.status["users"] == "published"
    assert ref.status["time_dim"] == "published"
    assert ref.status["songplays"] == "appended_delta"
    # songs/artists builders never re-ran
    assert calls["songs"] == 1 and calls["artists"] == 1
    assert calls["users"] == 2 and calls["songplays"] == 2

    # results ≡ a full rebuild over the same inputs into a second root
    calls2 = defaultdict(int)
    p2 = _sparkify_pipeline(spark, calls2)
    p2.input("song_data", f"{tmp_path}/in_songs")
    p2.input("log_data", f"{tmp_path}/in_logs")
    full = p2.run(spark, root=str(tmp_path / "pub2"))
    names = ("songs", "artists", "users", "time_dim", "songplays")
    assert _collect_all(ref, names) == _collect_all(full, names)


def test_refresh_falls_back_to_rebuild_on_non_insert_feed(
    spark, tmp_path
):
    from collections import defaultdict

    calls = defaultdict(int)
    p = _sparkify_pipeline(spark, calls)
    _, logs_in = _seed_inputs(spark, str(tmp_path))
    p.input("song_data", f"{tmp_path}/in_songs")
    p.input("log_data", f"{tmp_path}/in_logs")
    root = str(tmp_path / "pub")
    p.run(spark, root=root)

    # an overwrite produces deletes in the change feed → the row-wise
    # append would be WRONG; the table must fully rebuild instead
    logs_in.overwrite(_log_rows(spark, [(9, 9_000, "Alpha", "free")]))
    ref = p.refresh(spark, root=root)
    assert ref.status["songplays"] == "published"  # rebuilt, not appended
    assert ref.status["songs"] == "fresh"
    got = sorted(
        r["user_id"] for r in ref.frames["songplays"].collect()
    )
    assert got == [9]


def test_refresh_validation_and_registration_guards(spark, tmp_path):
    p = Pipeline("g")
    with pytest.raises(ValueError, match="incremental_on"):
        p.table("t", deps=("a",), incremental_on="b")(lambda s, a: a)
    with pytest.raises(ValueError, match="fail|warn"):
        p.table(
            "t2", deps=("a",), incremental_on="a", on_violation="drop"
        )(lambda s, a: a)
    p2 = Pipeline("g2")
    p2.input("src", str(tmp_path / "src"))
    with pytest.raises(ValueError, match="already registered"):
        p2.input("src", str(tmp_path / "src2"))
    with pytest.raises(ValueError, match="already registered"):
        p2.table("src")(lambda s: None)

    # incremental_on must point at an INPUT, not a table
    p3 = Pipeline("g3")

    @p3.table("a")
    def a(spark):
        return spark.range(1)

    @p3.table("b", deps=("a",), incremental_on="a")
    def b(spark, a):
        return a

    with pytest.raises(ValueError, match="declared input"):
        p3.run(spark)


def test_incremental_rejects_unique_specs(spark):
    """unique= gates are table-granular; a delta-only audit cannot see
    cross-append duplicates, so registration refuses the combination
    (review regression)."""
    p = Pipeline("g4")
    with pytest.raises(ValueError, match="unique"):
        p.table(
            "t", deps=("src",), incremental_on="src",
            unique=(("id",),),
        )(lambda s, src: src)


def test_refresh_delta_append_is_crash_atomic(spark, tmp_path):
    """ADVICE r8 (medium): the delta append commits BEFORE the state
    file records it. A crash in that window must NOT duplicate rows on
    the next refresh — the publish stamps its input-version vector
    into the txn commit (crash-atomic with the data), and refresh
    trusts the stamp over the stale state file: same-version replay
    recovers without re-appending; a further input append deltas from
    the STAMPED version, not the stale one."""
    from collections import defaultdict

    from etl_data_lake_spark.sources.txn import TxnTable

    calls = defaultdict(int)
    p = _sparkify_pipeline(spark, calls)
    _, logs_in = _seed_inputs(spark, str(tmp_path))
    p.input("song_data", f"{tmp_path}/in_songs")
    p.input("log_data", f"{tmp_path}/in_logs")
    root = str(tmp_path / "pub")
    p.run(spark, root=root)

    logs_in.append(
        _log_rows(spark, [(3, 4_000, "Alpha", "paid")])
    )

    # crash EXACTLY between the songplays delta append and its state
    # write: _write_state raises the first time it records songplays'
    # new vector
    real_write = p._write_state
    target = {"log_data": logs_in.latest_version()}

    def crashing_write(root_, state):
        if state.get("songplays", {}).get("log_data") == target["log_data"]:
            raise OSError("simulated crash before state write")
        real_write(root_, state)

    p._write_state = crashing_write
    with pytest.raises(OSError, match="simulated crash"):
        p.refresh(spark, root=root)
    p._write_state = real_write

    # the append COMMITTED (4 songplays rows on disk) but state lags
    tbl = TxnTable(spark, f"{root}/songplays")
    assert tbl.snapshot().count() == 4
    n_builds = calls["songplays"]

    # same-version refresh: recovered from the commit stamp — no
    # builder re-run, no second append, still 4 rows
    ref = p.refresh(spark, root=root)
    assert ref.status["songplays"] == "recovered"
    assert calls["songplays"] == n_builds
    assert ref.frames["songplays"].count() == 4

    # input moves again AFTER the crash: the delta must start at the
    # STAMPED version (the stale state would replay the 4_000 row)
    logs_in.append(_log_rows(spark, [(4, 5_000, "Beta", "paid")]))
    ref2 = p.refresh(spark, root=root)
    assert ref2.status["songplays"] == "appended_delta"
    rows = sorted(
        (r["user_id"], r["ts"]) for r in ref2.frames["songplays"].collect()
    )
    assert rows == [
        (1, 1_000), (1, 3_000), (2, 2_000), (3, 4_000), (4, 5_000),
    ]

    # ≡ a clean full rebuild over the same inputs
    calls2 = defaultdict(int)
    p2 = _sparkify_pipeline(spark, calls2)
    p2.input("song_data", f"{tmp_path}/in_songs")
    p2.input("log_data", f"{tmp_path}/in_logs")
    full = p2.run(spark, root=str(tmp_path / "pub2"))
    names = ("songs", "artists", "users", "time_dim", "songplays")
    assert _collect_all(ref2, names) == _collect_all(full, names)


def test_refresh_full_rebuild_is_crash_atomic_too(spark, tmp_path):
    """The adjacent hole: a FULL REBUILD (overwrite) that crashes
    before its state write must not be followed by a spurious delta
    append of rows the rebuild already contains. The overwrite carries
    the same commit stamp, so the next refresh recovers."""
    from collections import defaultdict

    from etl_data_lake_spark.sources.txn import TxnTable

    calls = defaultdict(int)
    p = _sparkify_pipeline(spark, calls)
    _, logs_in = _seed_inputs(spark, str(tmp_path))
    p.input("song_data", f"{tmp_path}/in_songs")
    p.input("log_data", f"{tmp_path}/in_logs")
    root = str(tmp_path / "pub")
    p.run(spark, root=root)

    # a non-insert feed (overwrite) forces the FULL-REBUILD path
    logs_in.overwrite(
        _log_rows(
            spark,
            [(1, 1_000, "Alpha", "free"), (9, 9_000, "Beta", "paid")],
        )
    )
    real_write = p._write_state
    target_v = logs_in.latest_version()

    def crashing_write(root_, state):
        if state.get("songplays", {}).get("log_data") == target_v:
            raise OSError("simulated crash before state write")
        real_write(root_, state)

    p._write_state = crashing_write
    with pytest.raises(OSError, match="simulated crash"):
        p.refresh(spark, root=root)
    p._write_state = real_write

    tbl = TxnTable(spark, f"{root}/songplays")
    assert tbl.snapshot().count() == 2  # rebuild committed

    # pure-insert append lands after the crash → refresh takes the
    # delta path; the low bound must come from the stamp, or the
    # rebuilt rows would double
    logs_in.append(_log_rows(spark, [(5, 6_000, "Alpha", "free")]))
    ref = p.refresh(spark, root=root)
    assert ref.status["songplays"] == "appended_delta"
    rows = sorted(
        (r["user_id"], r["ts"]) for r in ref.frames["songplays"].collect()
    )
    assert rows == [(1, 1_000), (5, 6_000), (9, 9_000)]
