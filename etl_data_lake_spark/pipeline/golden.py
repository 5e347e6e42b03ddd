"""The reference's four golden analytic queries (README.md:96-276),
dialect-translated from Postgres/Redshift to portable ANSI SQL.

Translation decisions (SURVEY §3.3):

* prefixed diagram names (``sp_``/``u_``/``s_``/``a_``) → the
  unprefixed names the ETL actually writes (etl.py:132-136);
* ``"quoted alias"`` group/order keys → plain identifiers (Spark
  resolves aliases in GROUP BY/ORDER BY; groupByAliases default on);
* ``||`` string concat and ``DATE_PART`` are kept — both parse
  identically in Spark SQL and DuckDB, so ONE text serves as the
  engine query and as its own oracle (tests/test_pipeline.py runs the
  same string through both).

Each query runs against the five views registered by
``PipelineResult.register_views()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# README.md:111-129 — top 10 most-played (title, artist) pairs.
# Inner joins drop unmatched (null song_id) plays: quirk Q6 semantics.
TOP_10_SONGS = """
WITH songplays_ext AS (
    SELECT s.title AS song_title, a.name AS artist_name
    FROM songplays sp
    JOIN songs s   ON sp.song_id = s.song_id
    JOIN artists a ON sp.artist_id = a.artist_id
)
SELECT song_title, artist_name, COUNT(*) AS play_count
FROM songplays_ext
GROUP BY song_title, artist_name
ORDER BY play_count DESC, song_title, artist_name
LIMIT 10
"""

# README.md:153-170 — top 10 users by songs played; the join is on the
# COMPOUND key (user_id, level) because users has a row per level
# (quirk Q7) — an id-only join would double-count level-switchers.
TOP_10_USERS = """
WITH songplays_ext AS (
    SELECT u.first_name || ' ' || u.last_name AS user_name,
           u.user_id AS user_id
    FROM songplays sp
    JOIN users u ON sp.user_id = u.user_id AND sp.level = u.level
)
SELECT user_name, user_id, COUNT(*) AS song_count
FROM songplays_ext
GROUP BY user_id, user_name
ORDER BY song_count DESC, user_name
LIMIT 10
"""

# README.md:194-220 — the user id with the max play count (uncorrelated
# scalar subquery; ties return multiple rows, as in the reference).
TOP_USER_ID = """
WITH songplays_ext AS (
    SELECT sp.session_id, u.user_id
    FROM songplays sp
    JOIN users u ON sp.user_id = u.user_id AND sp.level = u.level
),
session_counts AS (
    SELECT user_id, COUNT(session_id) AS play_count
    FROM songplays_ext
    GROUP BY user_id
)
SELECT user_id AS top_user_id
FROM session_counts
WHERE play_count = (SELECT MAX(play_count) FROM session_counts)
"""

# README.md:233-262 — top 5 sessions for one user; COUNT(s_title) is a
# non-null count (A5) and the date string renders unpadded parts
# ("2018-11-2", matching DATE_PART || rendering in the reference).
TOP_5_SESSIONS_FOR_USER = """
WITH songplays_user AS (
    SELECT * FROM songplays WHERE user_id = '{user_id}'
),
user_sessions AS (
    SELECT u.first_name, u.last_name, sp.session_id, sp.start_time, s.title
    FROM songplays_user sp
    JOIN users u ON sp.user_id = u.user_id AND sp.level = u.level
    JOIN songs s ON sp.song_id = s.song_id
)
SELECT first_name || ' ' || last_name AS user_name,
       session_id,
       CAST(DATE_PART('year', start_time) AS BIGINT) || '-' ||
       CAST(DATE_PART('month', start_time) AS BIGINT) || '-' ||
       CAST(DATE_PART('day', start_time) AS BIGINT) AS play_date,
       COUNT(title) AS song_count
FROM user_sessions
GROUP BY session_id, play_date, user_name
ORDER BY song_count DESC, play_date, session_id
LIMIT 5
"""


def top_10_songs(spark: SparkSession) -> DataFrame:
    return spark.sql(TOP_10_SONGS)


def top_10_users(spark: SparkSession) -> DataFrame:
    return spark.sql(TOP_10_USERS)


def top_user_id(spark: SparkSession) -> DataFrame:
    return spark.sql(TOP_USER_ID)


def top_5_sessions_for_user(spark: SparkSession, user_id: str) -> DataFrame:
    return spark.sql(TOP_5_SESSIONS_FOR_USER.format(user_id=user_id))


ALL_GOLDEN_SQL: dict[str, str] = {
    "top_10_songs": TOP_10_SONGS,
    "top_10_users": TOP_10_USERS,
    "top_user_id": TOP_USER_ID,
}
