"""Pipeline orchestration: raw JSON → five partitioned parquet tables.

Replaces the reference's ``main``/``process_song_data``/
``process_log_data`` (etl.py:40-227). Differences that matter:

* explicit source schemas (no inference scans — SURVEY §1.2);
* raw song data read ONCE; songplays derives from the songs/artists
  tables (fixes quirk Q5's double read + double inference);
* ``mode("overwrite")`` everywhere → idempotent re-runs (fixes Q9);
* repartition by the partition columns before every partitioned write:
  without it each of the N input tasks writes a file into each of the
  M output partitions (N×M small files — the classic 100 TB
  small-files failure); with it, one task owns one output partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_data_lake_spark.pipeline import tables as T
from etl_data_lake_spark.pipeline.schemas import LOG_SCHEMA, SONG_SCHEMA
from etl_data_lake_spark.session import apply_runtime_confs
from etl_data_lake_spark.sources.sinks import write_partitioned


@dataclass
class PipelineResult:
    songs: DataFrame
    artists: DataFrame
    users: DataFrame
    time: DataFrame
    songplays: DataFrame

    def tables(self) -> dict[str, DataFrame]:
        return {
            "songs": self.songs,
            "artists": self.artists,
            "users": self.users,
            "time": self.time,
            "songplays": self.songplays,
        }

    def register_views(self, prefix: str = "") -> None:
        for name, df in self.tables().items():
            df.createOrReplaceTempView(prefix + name)


def read_song_data(spark: SparkSession, path: str) -> DataFrame:
    """etl.py:61-64 — recursive glob over one-object-per-file JSON."""
    return spark.read.schema(SONG_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).json(path)


def read_log_data(spark: SparkSession, path: str) -> DataFrame:
    """etl.py:120-124 — NDJSON event files."""
    return spark.read.schema(LOG_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).json(path)


def _write(df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()) -> None:
    if partition_cols:
        write_partitioned(df, path, partition_cols)
    else:
        df.write.mode("overwrite").parquet(path)


def run_pipeline(
    spark: SparkSession,
    song_data_path: str,
    log_data_path: str,
    output_dir: str | None = None,
    surrogate: str = "row_number",
) -> PipelineResult:
    """Build the five tables; write them iff ``output_dir`` is given.

    Write layout mirrors the reference: songs by (year, artist_id)
    (etl.py:74-76), time and songplays by (year, month)
    (etl.py:167-169, 203-204), artists/users unpartitioned.
    """
    apply_runtime_confs(spark)
    song_data = read_song_data(spark, song_data_path)
    log_data = read_log_data(spark, log_data_path)

    songs = T.build_songs(song_data)
    artists = T.build_artists(song_data)
    users = T.build_users(log_data)
    time = T.build_time(log_data)

    if output_dir:
        out = output_dir.rstrip("/")
        _write(songs, f"{out}/songs", ("year", "artist_id"))
        _write(artists, f"{out}/artists")
        _write(users, f"{out}/users")
        _write(time, f"{out}/time", ("year", "month"))
        # derive the fact from the governed parquet dimensions (Q5 fix);
        # re-select canonical column order (partition cols read back last)
        songs = spark.read.parquet(f"{out}/songs").select(*songs.columns)
        artists = spark.read.parquet(f"{out}/artists").select(*artists.columns)

    songplays = T.build_songplays(log_data, songs, artists, surrogate=surrogate)
    if output_dir:
        _write(songplays, f"{out}/songplays", ("year", "month"))
        songplays = spark.read.parquet(f"{out}/songplays").select(
            *songplays.columns
        )

    return PipelineResult(songs, artists, users, time, songplays)
