"""End-to-end star-schema pipeline tests (SURVEY §7 step 4-5).

Covers: raw JSON reads with explicit schemas (S1/S2), the five table
builders with the reference's quirk semantics, partitioned parquet
sinks (S3/S4), and the four golden analytic queries — each golden SQL
string is run through BOTH Spark and DuckDB over the same written
parquet, so the queries are their own oracle.
"""

from __future__ import annotations

import pytest

from tests.fixtures_sparkify import USERS, write_sparkify_fixture


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    from etl_data_lake_spark.pipeline import run_pipeline

    raw = tmp_path_factory.mktemp("sparkify_raw")
    out = tmp_path_factory.mktemp("sparkify_out")
    song_path, log_path = write_sparkify_fixture(raw)
    res = run_pipeline(spark, song_path, log_path, output_dir=str(out))
    res.register_views()
    return res, out, log_path


def test_table_schemas(pipeline):
    res = pipeline[0]
    assert [f.name for f in res.songs.schema.fields] == [
        "song_id", "title", "artist_id", "year", "duration"]
    assert [f.name for f in res.artists.schema.fields] == [
        "artist_id", "name", "location", "latitude", "longitude"]
    assert [f.name for f in res.users.schema.fields] == [
        "user_id", "first_name", "last_name", "gender", "level"]
    assert [f.name for f in res.time.schema.fields] == [
        "start_time", "hour", "day", "week", "month", "year", "weekday"]
    assert [f.name for f in res.songplays.schema.fields] == [
        "songplay_id", "start_time", "user_id", "level", "song_id",
        "artist_id", "session_id", "location", "user_agent", "year", "month"]


def test_dims_dedup_and_key_filters(pipeline):
    res = pipeline[0]
    # empty-string song_id/artist_id dropped; one row per key
    songs = res.songs.collect()
    assert len(songs) == 8 and all(r.song_id for r in songs)
    artists = res.artists.collect()
    assert len(artists) == {r.artist_id for r in artists} .__len__()
    assert all(r.artist_id for r in artists)


def test_users_level_quirk_replicated(pipeline):
    """Quirk Q7: a level-switching user has one row per level."""
    res = pipeline[0]
    rows = res.users.collect()
    switchers = {u[0] for u in USERS if len(set(u[4])) > 1}
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, set()).add(r.level)
    for uid in switchers:
        assert by_user[uid] == {"free", "paid"}
    assert "" not in by_user  # anonymous traffic dropped


def test_users_latest_level_variant(pipeline, spark):
    from etl_data_lake_spark.pipeline.etl import read_log_data
    from etl_data_lake_spark.pipeline.tables import build_users_latest_level

    _, _, log_path = pipeline
    latest = build_users_latest_level(read_log_data(spark, log_path))
    rows = latest.collect()
    assert len(rows) == len({r.user_id for r in rows})
    switch_levels = {u[0]: u[4][-1] for u in USERS if len(set(u[4])) > 1}
    for r in rows:
        if r.user_id in switch_levels:
            assert r.level == switch_levels[r.user_id]


def test_songplays_left_join_nulls_and_partitions(pipeline):
    """Quirk Q6: plays of unknown songs keep null song_id; output is
    hive-partitioned by (year, month) spanning two months."""
    res, out, _ = pipeline
    sp = res.songplays
    assert sp.filter("song_id IS NULL").count() > 0
    assert sp.filter("song_id IS NOT NULL").count() > 0
    months = {(r.year, r.month) for r in sp.select("year", "month").distinct().collect()}
    assert months == {(2018, 11), (2018, 12)}
    part_dirs = {p.name for p in (out / "songplays").iterdir() if p.is_dir()}
    assert part_dirs == {"year=2018"}
    sub = {p.name for p in (out / "songplays" / "year=2018").iterdir() if p.is_dir()}
    assert sub == {"month=11", "month=12"}


def test_surrogate_key_unique(pipeline):
    res = pipeline[0]
    sp = res.songplays
    n = sp.count()
    assert sp.select("year", "month", "songplay_id").distinct().count() == n


def test_time_dimension_weekday_fixed(pipeline):
    """Quirk Q4 fixed: weekday is an actual day-of-week name."""
    res = pipeline[0]
    days = {r.weekday for r in res.time.select("weekday").distinct().collect()}
    assert days <= {"Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"}
    assert len(days) == 7


GOLDEN_NAMES = ["top_10_songs", "top_10_users", "top_user_id"]


@pytest.mark.parametrize("name", GOLDEN_NAMES)
def test_golden_queries_match_duckdb(pipeline, spark, name):
    """The same SQL text through Spark and DuckDB over the same parquet."""
    import duckdb

    from etl_data_lake_spark.pipeline.golden import ALL_GOLDEN_SQL

    _, out, _ = pipeline
    con = duckdb.connect()
    for t in ("songs", "artists", "users", "time", "songplays"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet"
            f"('{out}/{t}/**/*.parquet', hive_partitioning=true)"
        )
    sql = ALL_GOLDEN_SQL[name]
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in con.sql(sql).fetchall()]
    if name == "top_user_id":  # unordered single-col result
        got, want = sorted(got), sorted(want)
    assert got == want and len(got) > 0


def test_golden_literal_rows(pipeline, spark):
    """Literal golden outputs on the deterministic fixture — the analog
    of the README's committed result tables (README.md:134-145: top =
    "You're The One" / 37). Pins the reference's SEMANTICS, not just
    Spark ≡ DuckDB: quirk Q6 dirty-data duplicates (the same title
    under two artist-id variants must BOTH chart), the compound
    (user_id, level) join for the level-switching top user (Q7), the
    scalar-subquery max, and Q4's unpadded DATE_PART date rendering."""
    from etl_data_lake_spark.pipeline.golden import (
        top_5_sessions_for_user,
        top_10_songs,
        top_10_users,
        top_user_id,
    )

    q1 = [tuple(r) for r in top_10_songs(spark).collect()]
    assert q1[0] == ("Midnight Harbor", "The Lanterns", 103)
    # known-dirty-data expectation: both artist-id variants of the same
    # title chart separately (README.md:109,147)
    assert q1[1] == ("Copper Sky", "Vel Moraine & Co", 73)
    assert q1[2] == ("Copper Sky", "Vel Moraine", 68)

    q2 = [tuple(r) for r in top_10_users(spark).collect()]
    assert q2[0] == ("Nora Fleet", "11", 162)
    assert q2[1] == ("Rosa Umber", "15", 143)

    assert [tuple(r) for r in top_user_id(spark).collect()] == [("11",)]

    q4 = [tuple(r) for r in top_5_sessions_for_user(spark, "11").collect()]
    assert q4 == [
        ("Nora Fleet", 167, "2018-11-12", 6),
        ("Nora Fleet", 281, "2018-12-1", 6),  # unpadded month/day (F5)
        ("Nora Fleet", 179, "2018-11-14", 5),
        ("Nora Fleet", 185, "2018-11-15", 5),
        ("Nora Fleet", 197, "2018-11-17", 5),
    ]


def test_golden_q4_sessions(pipeline, spark):
    import duckdb

    from etl_data_lake_spark.pipeline.golden import (
        TOP_5_SESSIONS_FOR_USER,
        top_5_sessions_for_user,
        top_user_id,
    )

    _, out, _ = pipeline
    top = top_user_id(spark).collect()[0][0]
    con = duckdb.connect()
    for t in ("songs", "users", "songplays"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet"
            f"('{out}/{t}/**/*.parquet', hive_partitioning=true)"
        )
    got = [tuple(r) for r in top_5_sessions_for_user(spark, top).collect()]
    want = [tuple(r) for r in con.sql(
        TOP_5_SESSIONS_FOR_USER.format(user_id=top)).fetchall()]
    assert got == want and len(got) > 0
