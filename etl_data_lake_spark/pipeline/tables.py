"""The five dimensional-table builders, as pure DataFrame transforms.

Each function mirrors one table build in the reference
(``/root/reference/etl.py``), with the quirk decisions from SURVEY
Appendix A applied:

* fixed:      Q1-Q3 (no Python UDFs — ``timestamp_millis`` instead of
  the local-timezone ``datetime.fromtimestamp`` UDFs at etl.py:144-153),
  Q4 (weekday really is the weekday), Q5 (songplays reads the songs
  *table*, not the raw JSON again).
* replicated: Q6 (title/artist-name enrichment join → mostly-null
  song_id/artist_id in the fact — that IS the defined semantics),
  Q7 (``users`` keeps one row per (user_id, level) — the golden
  queries join on the compound key and depend on it).

Scale notes inline: the enrichment join broadcasts the song dimension,
and the surrogate key has a shuffle-free variant for 100 TB runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_songs(song_data: DataFrame) -> DataFrame:
    """songs(song_id, title, artist_id, year, duration) — etl.py:67-76.

    Empty-string AND null keys are both dropped (the reference needs
    the filter at etl.py:68 and the dropna at etl.py:70 — they are
    different rows). Dedup on the primary key with a deterministic
    survivor (max duration as tiebreak) instead of the reference's
    full-row ``dropDuplicates()``: at scale a subset-dedup shuffles
    only the key, and is idempotent under re-runs.
    """
    w = Window.partitionBy("song_id").orderBy(
        F.desc_nulls_last("duration"), F.asc("title")
    )
    return (
        song_data.filter((F.col("song_id") != "") & F.col("song_id").isNotNull())
        .select("song_id", "title", "artist_id", "year", "duration")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_artists(song_data: DataFrame) -> DataFrame:
    """artists(artist_id, name, location, latitude, longitude) —
    etl.py:79-90. One row per artist_id (deterministic survivor)."""
    w = Window.partitionBy("artist_id").orderBy(
        F.desc_nulls_last("year"), F.asc("artist_name")
    )
    return (
        song_data.filter(
            (F.col("artist_id") != "") & F.col("artist_id").isNotNull()
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "artist_id",
            F.col("artist_name").alias("name"),
            F.col("artist_location").alias("location"),
            F.col("artist_latitude").alias("latitude"),
            F.col("artist_longitude").alias("longitude"),
        )
    )


def songplay_events(log_data: DataFrame) -> DataFrame:
    """The reference's event-type predicate (etl.py:127) plus the
    epoch-ms → timestamp conversion done ONCE here (replaces UDFs
    U1/U2, etl.py:144-153; UTC via session timezone)."""
    return log_data.where(F.col("page") == "NextSong").withColumn(
        "start_time", F.timestamp_millis(F.col("ts"))
    )


def build_users(log_data: DataFrame) -> DataFrame:
    """users(user_id, first_name, last_name, gender, level) —
    etl.py:130-141.

    Quirk Q7 REPLICATED: dedup over all five columns, so a user who
    switched level appears once per (user_id, level). The golden
    queries join ``sp_user_id = u_user_id AND sp_level = u_level``
    (README.md:158-160) and would double-count otherwise.
    """
    return (
        songplay_events(log_data)
        .filter((F.col("userId") != "") & F.col("userId").isNotNull())
        .select(
            F.col("userId").alias("user_id"),
            F.col("firstName").alias("first_name"),
            F.col("lastName").alias("last_name"),
            "gender",
            "level",
        )
        .dropDuplicates()
    )


def build_users_latest_level(log_data: DataFrame) -> DataFrame:
    """SCD-style extension (SURVEY Q7 decision): ONE row per user_id,
    carrying the level of their latest event."""
    w = Window.partitionBy("user_id").orderBy(F.desc("start_time"))
    return (
        songplay_events(log_data)
        .filter((F.col("userId") != "") & F.col("userId").isNotNull())
        .select(
            F.col("userId").alias("user_id"),
            F.col("firstName").alias("first_name"),
            F.col("lastName").alias("last_name"),
            "gender",
            "level",
            "start_time",
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "start_time")
    )


def build_time(log_data: DataFrame) -> DataFrame:
    """time(start_time, hour, day, week, month, year, weekday) —
    etl.py:156-169, all built-in date functions (no UDFs).

    Quirk Q4 FIXED: the reference's ``date_format(c,'F')`` is
    day-of-week-in-month, not a weekday; we emit the 'E' pattern
    ("Mon".."Sun") the column name promises.
    """
    return (
        songplay_events(log_data)
        .select("start_time")
        .dropDuplicates()
        .select(
            "start_time",
            F.hour("start_time").cast("int").alias("hour"),
            F.dayofmonth("start_time").cast("int").alias("day"),
            F.weekofyear("start_time").cast("int").alias("week"),
            F.month("start_time").cast("int").alias("month"),
            F.year("start_time").cast("int").alias("year"),
            F.date_format("start_time", "E").alias("weekday"),
        )
    )


def build_songplays(
    log_data: DataFrame,
    songs: DataFrame,
    artists: DataFrame,
    surrogate: str = "row_number",
) -> DataFrame:
    """songplays fact — etl.py:172-204.

    Quirk Q5 FIXED: the reference re-reads the raw song JSON
    (etl.py:172) for the enrichment join; we join the *songs table*
    (+ artists for the name), so the fact is derived from governed
    dimensions and the raw data is scanned once per run.

    Quirk Q6 REPLICATED: the join key is (song title, artist name) —
    left outer, so unmatched plays keep null song_id/artist_id.

    The song-side is a dimension (small relative to the event log) →
    explicit ``broadcast``: the 100 TB fact never shuffles for this
    join.

    surrogate='row_number' replicates the reference's per-(year,month)
    ``row_number`` key (etl.py:192-200) — a per-month global sort,
    fine at dim scale. surrogate='monotonic' is the 100 TB batch path:
    ``monotonically_increasing_id`` is shuffle-free and unique (not
    dense, not stable across runs — same instability the reference
    already has, quirk Q8). surrogate='hash' derives the key from the
    natural event identity (xxhash64 over session/user/time/context) —
    the only strategy valid under Structured Streaming, and the only
    one stable across reruns; collisions require two events identical
    in every natural column.
    """
    song_dim = songs.join(
        artists.select("artist_id", F.col("name").alias("artist_name")),
        "artist_id",
        "left",
    ).select("song_id", "title", "artist_id", "artist_name")

    events = songplay_events(log_data)
    enriched = events.join(
        F.broadcast(song_dim),
        (events.song == song_dim.title) & (events.artist == song_dim.artist_name),
        "left_outer",
    ).select(
        "start_time",
        F.col("userId").alias("user_id"),
        "level",
        "song_id",
        "artist_id",
        F.col("sessionId").alias("session_id"),
        "location",
        F.col("userAgent").alias("user_agent"),
        F.year("start_time").cast("int").alias("year"),
        F.month("start_time").cast("int").alias("month"),
    )

    if surrogate == "monotonic":
        keyed = enriched.withColumn("songplay_id", F.monotonically_increasing_id())
    elif surrogate == "hash":
        keyed = enriched.withColumn(
            "songplay_id",
            F.xxhash64(
                "session_id", "user_id", "start_time", "song_id", "location"
            ),
        )
    else:
        w = Window.partitionBy("year", "month").orderBy(
            F.desc("start_time"), F.desc("user_id")
        )
        keyed = enriched.withColumn(
            "songplay_id", F.row_number().over(w).cast("int")
        )
    return keyed.select(
        "songplay_id",
        "start_time",
        "user_id",
        "level",
        "song_id",
        "artist_id",
        "session_id",
        "location",
        "user_agent",
        "year",
        "month",
    )
