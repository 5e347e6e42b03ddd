"""Explicit source schemas for the two raw JSON datasets.

The reference relies on ``spark.read.json`` schema inference
(etl.py:64, 124, 172), which costs a full extra pass over the data per
read and makes output types depend on whatever happens to be in the
input. At 100 TB an inference pass is an extra 100 TB scan; explicit
schemas also let the JSON parser skip fields that are never selected
(column pruning reaches the parser).

Field names/types per SURVEY §1.2 (inferred from the samples at
README.md:32,47).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# song_data/*/*/*/TR*.json — one JSON object per file (README.md:22-32)
SONG_SCHEMA = StructType(
    [
        StructField("num_songs", LongType()),
        StructField("artist_id", StringType()),
        StructField("artist_latitude", DoubleType()),
        StructField("artist_longitude", DoubleType()),
        StructField("artist_location", StringType()),
        StructField("artist_name", StringType()),
        StructField("song_id", StringType()),
        StructField("title", StringType()),
        StructField("duration", DoubleType()),
        StructField("year", LongType()),
    ]
)

# log_data/.../*-events.json — NDJSON (README.md:37-47); `ts` is epoch
# MILLISECONDS (etl.py:144), `userId` a numeric-looking string that may
# be "" (etl.py:131)
LOG_SCHEMA = StructType(
    [
        StructField("artist", StringType()),
        StructField("auth", StringType()),
        StructField("firstName", StringType()),
        StructField("gender", StringType()),
        StructField("itemInSession", LongType()),
        StructField("lastName", StringType()),
        StructField("length", DoubleType()),
        StructField("level", StringType()),
        StructField("location", StringType()),
        StructField("method", StringType()),
        StructField("page", StringType()),
        StructField("registration", DoubleType()),
        StructField("sessionId", LongType()),
        StructField("song", StringType()),
        StructField("status", LongType()),
        StructField("ts", LongType()),
        StructField("userAgent", StringType()),
        StructField("userId", StringType()),
    ]
)
