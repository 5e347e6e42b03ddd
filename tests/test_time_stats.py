"""Date/timestamp file statistics: footer stats on time columns are
normalized to fixed-width ISO strings (lexicographic == chronological,
JSON-manifest safe), every range comparator normalizes caller bounds
the same way, and staged writes force TIMESTAMP_MICROS (Spark's INT96
default writes NO footer min/max — measured) — so time-range pruning,
the most common 100 TB scan pattern, works on txn tables like any
numeric column. Reference: /root/reference/etl.py reads everything
always; pruning is extension surface."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.sources.merge import merge_into
from etl_data_lake_spark.sources.txn import TxnTable, _stat_key


def _events(spark, day: int, n=4):
    """n rows inside 2026-03-<day>, one file's worth."""
    return spark.range(n).select(
        (F.col("id") + day * 100).alias("k"),
        F.to_timestamp(
            F.concat(
                F.lit(f"2026-03-{day:02d} 0"),
                F.col("id").cast("string"),
                F.lit(":00:00"),
            )
        ).alias("ts"),
    )


def test_stat_key_normalization():
    assert _stat_key(datetime.date(2026, 3, 5)) == "2026-03-05"
    assert _stat_key(
        datetime.datetime(2026, 3, 5, 1, 2, 3, 4)
    ) == "2026-03-05 01:02:03.000004"
    # aware -> UTC; year < 1000 zero-padded (strftime %Y would not be)
    aware = datetime.datetime(
        2026, 3, 5, 2, 0, 0,
        tzinfo=datetime.timezone(datetime.timedelta(hours=2)),
    )
    assert _stat_key(aware) == "2026-03-05 00:00:00.000000"
    assert _stat_key(datetime.datetime(999, 1, 1)).startswith("0999-")
    assert _stat_key(42) == 42 and _stat_key("x") == "x"


def test_timestamp_range_prunes_and_reads_exact(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 2, 3):
        t.append(_events(spark, day).coalesce(1), stats_cols=("ts",))
    meta = t.snapshot_meta()
    # stats recorded as ISO strings (JSON-manifest safe)
    vals = [s["ts"] for s in meta.file_stats.values() if "ts" in s]
    assert vals and all(isinstance(v[0], str) for v in vals)
    lo = datetime.datetime(2026, 3, 2)
    hi = datetime.datetime(2026, 3, 2, 23, 59, 59)
    kept, total = t.files_matching({"ts": (lo, hi)})
    assert total == 3 and len(kept) == 1
    got = t.snapshot_where("ts", lo, hi)
    assert sorted(r.k for r in got.collect()) == [200, 201, 202, 203]
    # boundary exactness: a bound equal to a file's max keeps the file
    kept2, _ = t.files_matching(
        {"ts": (datetime.datetime(2026, 3, 1, 3), lo)}
    )
    assert len(kept2) == 2


def test_date_column_stats(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 2):
        df = spark.range(3).select(
            F.col("id").alias("k"),
            F.to_date(F.lit(f"2026-04-{day:02d}")).alias("d"),
        )
        t.append(df.coalesce(1), stats_cols=("d",))
    kept, total = t.files_matching(
        {"d": (datetime.date(2026, 4, 2), datetime.date(2026, 4, 2))}
    )
    assert total == 2 and len(kept) == 1
    assert t.snapshot_where(
        "d", datetime.date(2026, 4, 1), datetime.date(2026, 4, 1)
    ).count() == 3


def test_merge_on_timestamp_key_prunes_and_guards(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 2, 3):
        t.append(_events(spark, day).coalesce(1), stats_cols=("ts",))
    untouched = [
        f for f in t.snapshot_meta().files
        if t.snapshot_meta().file_stats[f]["ts"][0].startswith("2026-03-01")
    ]
    src = spark.createDataFrame(
        [(999, datetime.datetime(2026, 3, 2, 1, 0, 0))], "k long, ts timestamp"
    ).select("k", "ts")
    # key on ts: the day-2 row updates in place, day-1/3 files survive
    merge_into(t, src, "ts", stats_cols=("ts",))
    assert set(untouched) <= set(t.snapshot_meta().files)
    got = {r.ts: r.k for r in t.snapshot().collect()}
    assert got[datetime.datetime(2026, 3, 2, 1, 0, 0)] == 999
    assert len(got) == 12


def test_delete_where_timestamp_range(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 2):
        t.append(_events(spark, day).coalesce(1), stats_cols=("ts",))
    day1 = [
        f for f in t.snapshot_meta().files
        if t.snapshot_meta().file_stats[f]["ts"][0].startswith("2026-03-01")
    ]
    t.delete_where(
        "ts",
        datetime.datetime(2026, 3, 2),
        datetime.datetime(2026, 3, 2, 23),
        stats_cols=("ts",),
    )
    # the day-1 file was never rewritten (stats-pruned out of the scope)
    assert set(day1) <= set(t.snapshot_meta().files)
    assert t.snapshot().count() == 4
    assert all(
        r.ts.day == 1 for r in t.snapshot().select("ts").collect()
    )


def test_nanos_unit_max_is_ceiled(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_data_lake_spark.sources.txn import convert_parquet_dir

    raw = tmp_path / "raw"
    raw.mkdir()
    ts = pa.array(
        [1_700_000_000_123_456_789],  # ns precision: .123456789
        type=pa.timestamp("ns"),
    )
    pq.write_table(
        pa.table({"k": pa.array([1]), "ts": ts}), raw / "a.parquet"
    )
    t = convert_parquet_dir(spark, str(raw), stats_cols=("ts",))
    lo_s, hi_s = t.snapshot_meta().file_stats["a.parquet"]["ts"][:2]
    # min floored to µs (conservative); max ceiled one µs past the
    # floored footer value so no real ns value can sit above it
    assert lo_s.endswith(".123456")
    assert hi_s.endswith(".123457")
    # the row is found when querying exactly its truncated µs instant
    q = datetime.datetime.utcfromtimestamp(1_700_000_000).replace(
        microsecond=123456
    )
    kept, total = t.files_matching({"ts": (q, q)})
    assert (len(kept), total) == (1, 1)


def test_stats_survive_checkpoint_and_json(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=2)
    for day in (1, 2, 3, 4):
        t.append(_events(spark, day).coalesce(1), stats_cols=("ts",))
    fresh = TxnTable(spark, str(t.root), checkpoint_interval=2)
    kept, total = fresh.files_matching(
        {"ts": (datetime.datetime(2026, 3, 3), datetime.datetime(2026, 3, 3, 23))}
    )
    assert total == 4 and len(kept) == 1


def test_restore_to_timestamp_and_vacuum_dry_run(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_events(spark, 1).coalesce(1), stats_cols=("ts",))  # v1
    ts_after_v1 = t._read_manifest(1)["ts_ms"]
    t.overwrite(_events(spark, 2).coalesce(1), stats_cols=("ts",))  # v2
    # dry run counts the reclaimable v1 dir without touching it
    would = t.vacuum(keep_versions=1, dry_run=True)
    assert would >= 1
    assert t.snapshot_meta(1) is not None  # still time-travelable
    assert t.snapshot(1).count() == 4
    # restore by wall-clock stamp lands on v1's state
    t.restore_to_timestamp(ts_after_v1)
    assert sorted(r.k for r in t.snapshot().collect()) == [
        100, 101, 102, 103,
    ]
    # and the real vacuum reclaims exactly what the dry run promised
    assert t.vacuum(keep_versions=t.latest_version()) == 0  # keep all
    reclaim = t.vacuum(keep_versions=1, dry_run=True)
    assert t.vacuum(keep_versions=1) == reclaim


def test_zorder_on_timestamp_and_date_columns(spark, tmp_path):
    # timestamps are the canonical events cluster key: the Morton
    # curve quantizes them as epoch seconds (dates as epoch days via
    # unix_date — Spark refuses a direct double cast), and the new
    # ISO time stats make the clustered spans prunable
    t = TxnTable(spark, str(tmp_path / "t"))
    rows = spark.range(64).select(
        (F.col("id") % 8).alias("k"),
        F.timestamp_seconds(
            F.lit(1_767_225_600) + (F.col("id") / 8).cast("long") * 86400
        ).alias("ts"),
    )
    t.append(rows.repartition(8), stats_cols=("k", "ts"))
    t.optimize_zorder(("ts", "k"), bits=3)
    lo = datetime.datetime(2026, 1, 2)
    hi = datetime.datetime(2026, 1, 2, 23)
    kept, total = t.files_matching({"ts": (lo, hi)})
    assert total >= 2 and len(kept) < total  # time dimension prunes
    got = t.snapshot_where_ranges({"ts": (lo, hi), "k": (3, 3)})
    assert got.count() == 1
    # date columns freeze a numeric spec too (epoch days)
    t2 = TxnTable(spark, str(tmp_path / "t2"))
    t2.append(
        spark.range(8).select(
            F.col("id").alias("k"),
            F.date_add(F.lit(datetime.date(2026, 4, 1)), F.col("id").cast("int")).alias("d"),
        ),
        stats_cols=("k",),
    )
    t2.optimize_zorder(("d", "k"), bits=2)
    spec = t2.snapshot_meta().zorder_spec
    assert spec["num"]["d"][0] is not None
    assert t2.snapshot().count() == 8


def test_datasource_pushdown_prunes_timestamps(spark, tmp_path):
    from etl_data_lake_spark.sources.lake_datasource import _overlaps

    # unit-level: ISO-string stats vs datetime filter values
    from pyspark.sql.datasource import EqualTo, GreaterThan

    rng = ["2026-03-02 00:00:00.000000", "2026-03-02 03:00:00.000000"]
    inside = datetime.datetime(2026, 3, 2, 1)
    after = datetime.datetime(2026, 3, 5)
    assert _overlaps(rng, EqualTo(("ts",), inside))
    assert not _overlaps(rng, EqualTo(("ts",), after))
    assert not _overlaps(rng, GreaterThan(("ts",), after))
    assert _overlaps(rng, GreaterThan(("ts",), inside))


# ---------------------------------------------------------------------
# round-5 review regressions: mixed date/timestamp bound widths,
# incomparable bound types, the unit sniff, and conf save/restore races
# ---------------------------------------------------------------------


def test_date_bound_against_timestamp_stats_keeps_midnight_file(
    spark, tmp_path
):
    """A datetime.date bound on a TIMESTAMP column compares a 10-char
    ISO string against 26-char stats — without width reconciliation
    the midnight-containing file was pruned and its matching row
    silently lost (the residual filter casts the date to midnight and
    matches it)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (2, 3):
        t.append(_events(spark, day).coalesce(1), stats_cols=("ts",))
    d = datetime.date(2026, 3, 2)
    kept, total = t.files_matching({"ts": (d, d)})
    assert (len(kept), total) == (1, 2)
    got = t.snapshot_where("ts", d, d)
    assert [r.k for r in got.collect()] == [200]  # the midnight row


def test_timestamp_bound_against_date_stats_keeps_boundary_file(
    spark, tmp_path
):
    """The converse width mix: a midnight datetime lower bound against
    DATE-column stats — lexicographically '2026-04-01' sorts BELOW
    '2026-04-01 00:00:00.000000', so the rng[1] < lo test wrongly
    pruned the file whose dates cast exactly to the bound."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 2):
        df = spark.range(3).select(
            F.col("id").alias("k"),
            F.to_date(F.lit(f"2026-04-{day:02d}")).alias("d"),
        )
        t.append(df.coalesce(1), stats_cols=("d",))
    lo = datetime.datetime(2026, 4, 1)  # == midnight of the day-1 file
    hi = datetime.datetime(2026, 4, 1, 12)
    kept, total = t.files_matching({"d": (lo, hi)})
    assert (len(kept), total) == (1, 2)
    assert t.snapshot_where("d", lo, hi).count() == 3


def test_incomparable_bounds_keep_conservatively(spark, tmp_path):
    """Type-mismatched bounds (epoch ints against ISO-string time
    stats) must degrade to a conservative keep like _overlaps and the
    bloom tier — not crash with TypeError."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 2):
        t.append(_events(spark, day).coalesce(1), stats_cols=("ts",))
    kept, total = t.files_matching({"ts": (0, 10**15)})
    assert (len(kept), total) == (2, 2)  # no proof -> keep all
    assert len(t.files_matching_any("ts", [(0, 10**15)])) == 2


def test_micros_unit_max_is_exact_not_ceiled(tmp_path):
    """The unit sniff reads pyarrow's logical-type repr (the attrs are
    None on every released pyarrow — measured): a micros-unit footer
    is exact, so its max must NOT be ceiled, and datetime.max must not
    overflow the ceil path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_data_lake_spark.sources.txn import footer_stats

    ts = pa.array(
        [
            datetime.datetime(2026, 1, 1, 12, 0, 0, 123456),
            datetime.datetime.max,
        ],
        type=pa.timestamp("us"),
    )
    pq.write_table(
        pa.table({"k": pa.array([1, 2]), "ts": ts}), tmp_path / "a.parquet"
    )
    stats = footer_stats(tmp_path, ["a.parquet"], ("ts",))
    assert stats["a.parquet"]["ts"][1] == "9999-12-31 23:59:59.999999"


def test_micros_conf_save_restore_is_refcounted(spark):
    """Overlapping stagers share the session conf: the first finisher
    must not flip it back while another stage write is running — only
    the LAST exit restores."""
    from etl_data_lake_spark.sources.txn import _micros_ts_writes

    key = "spark.sql.parquet.outputTimestampType"
    old = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try:
        with _micros_ts_writes(spark):
            with _micros_ts_writes(spark):
                assert spark.conf.get(key) == "TIMESTAMP_MICROS"
            # inner exit: still held by the outer enterer
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
        assert spark.conf.get(key) == "INT96"
    finally:
        spark.conf.set(key, old)


def test_zorder_key_standalone_handles_date_columns(spark):
    """_z_num_expr is shared by the frozen-spec path AND the standalone
    zorder_key (write_zorder_clustered/write_zorder_txn) — a DATE
    cluster column must key via epoch days everywhere, not crash on
    Spark's refused date->double cast."""
    from etl_data_lake_spark.sources.sinks import zorder_key

    df = spark.range(8).select(
        F.col("id"),
        F.date_add(F.to_date(F.lit("2026-01-01")), F.col("id").cast("int")).alias("d"),
    )
    keyed = zorder_key(df, ("d", "id"))
    rows = keyed.collect()
    assert len(rows) == 8
    assert all(r["_z"] is not None for r in rows)
    # later dates never get smaller single-column buckets: keys on the
    # d dimension are monotone because unix_date is order-preserving
    only_d = zorder_key(df, ("d",)).orderBy("id").collect()
    zs = [r["_z"] for r in only_d]
    assert zs == sorted(zs)


def test_widen_iso_property_matches_cast_semantics():
    """Property: over ISO-normalized values, _stats_disjoint must
    agree EXACTLY with the semantic comparison under Spark's
    DATE→TIMESTAMP cast (date = its midnight) for every width
    combination — no false skip (correctness) and no false keep
    beyond the semantic answer (pruning power)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_data_lake_spark.sources.txn import _stats_disjoint

    lo_dt = datetime.datetime(1, 1, 2)
    hi_dt = datetime.datetime(9999, 12, 30)

    def midnight(v):
        if isinstance(v, datetime.datetime):
            return v
        return datetime.datetime(v.year, v.month, v.day)

    vals = st.one_of(
        st.datetimes(min_value=lo_dt, max_value=hi_dt),
        st.dates(
            min_value=lo_dt.date(), max_value=hi_dt.date()
        ),
    )

    @settings(max_examples=300, deadline=None)
    @given(a=vals, b=vals, c=vals, d=vals)
    def check(a, b, c, d):
        s_lo, s_hi = sorted((a, b), key=midnight)
        q_lo, q_hi = sorted((c, d), key=midnight)
        got = _stats_disjoint(
            [_stat_key(s_lo), _stat_key(s_hi)],
            _stat_key(q_lo),
            _stat_key(q_hi),
        )
        want = midnight(s_lo) > midnight(q_hi) or (
            midnight(s_hi) < midnight(q_lo)
        )
        assert got == want

    check()


def test_micros_conf_set_per_session(spark):
    """The refcount is keyed PER SESSION: while one session's stager
    holds the conf, a stager on spark.newSession() (its own SQLConf)
    must still get TIMESTAMP_MICROS set there — not silently skip
    because a global depth was nonzero (review regression)."""
    from etl_data_lake_spark.sources.txn import _micros_ts_writes

    key = "spark.sql.parquet.outputTimestampType"
    other = spark.newSession()
    old_a, old_b = spark.conf.get(key), other.conf.get(key)
    spark.conf.set(key, "INT96")
    other.conf.set(key, "INT96")
    try:
        with _micros_ts_writes(spark):
            with _micros_ts_writes(other):
                assert spark.conf.get(key) == "TIMESTAMP_MICROS"
                assert other.conf.get(key) == "TIMESTAMP_MICROS"
            # B restored independently; A still held
            assert other.conf.get(key) == "INT96"
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
        assert spark.conf.get(key) == "INT96"
    finally:
        spark.conf.set(key, old_a)
        other.conf.set(key, old_b)
