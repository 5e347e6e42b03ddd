"""Schema-first readers for the formats a lake ingests (JSON/CSV/
Parquet), with explicit bad-record policy.

The reference reads schemaless JSON and silently null-fills anything
malformed (Spark PERMISSIVE default, etl.py:64,124). At 100 TB that
policy hides corruption until an analyst finds the nulls; these
readers make the choice explicit:

* ``on_error='capture'`` (default): PERMISSIVE + a ``_corrupt``
  column — bad rows survive, visibly quarantined, and
  ``split_corrupt`` separates them for a dead-letter sink;
* ``on_error='fail'``: FAILFAST — the job dies on first bad record;
* ``on_error='drop'``: DROPMALFORMED — bad rows vanish (the only mode
  with silent data loss; opt-in).

Schemas are REQUIRED — inference is an extra full scan and a types
lottery (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt"

_MODES = {"capture": "PERMISSIVE", "fail": "FAILFAST", "drop": "DROPMALFORMED"}


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    on_error: str = "capture",
    **options: str,
) -> DataFrame:
    mode = _MODES[on_error]
    reader = spark.read.option("mode", mode)
    if on_error == "capture":
        schema = _with_corrupt(schema)
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    on_error: str = "capture",
    header: bool = True,
    delimiter: str = ",",
    **options: str,
) -> DataFrame:
    mode = _MODES[on_error]
    reader = (
        spark.read.option("mode", mode)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
    )
    if on_error == "capture":
        schema = _with_corrupt(schema)
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).csv(path)


def read_parquet(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Parquet is self-describing; the schema arg here PRUNES (and
    type-checks) — only the requested columns reach the scan."""
    return spark.read.schema(schema).parquet(path)


def read_avro(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    on_error: str = "capture",
) -> DataFrame:
    """Avro container files through the ``avrolake`` Python DataSource
    (sources/avro_source — the spark-avro jar is absent here, so the
    format is implemented from the public spec). Same policy surface
    as the JSON/CSV readers, with the bad-record unit being the Avro
    BLOCK (the encoding has no per-row framing; see avro_source):
    'capture' appends ``_corrupt`` rows per bad block, 'fail' raises,
    'drop' skips. ``schema=None`` infers from one container header."""
    if on_error not in _MODES:
        raise ValueError(f"on_error must be one of {sorted(_MODES)}")
    from etl_data_lake_spark.sources.avro_source import (
        capture_schema,
        register_avro_source,
    )

    register_avro_source(spark)
    reader = (
        spark.read.format("avrolake")
        .option("on_error", on_error)
        # DataSource planning runs session-less: ship the tz so the
        # instant-column UTC guard can actually fire there
        .option(
            "sessionTimeZone",
            spark.conf.get("spark.sql.session.timeZone", ""),
        )
    )
    if schema is not None:
        if on_error == "capture":
            # every data column nullable: a captured bad block emits
            # one all-null row with the diagnostic in _corrupt
            schema = capture_schema(schema)
        reader = reader.schema(schema)
    return reader.load(path)


def write_avro(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    codec: str = "deflate",
) -> None:
    """Write a DataFrame as Avro container files (one ``part-*.avro``
    per task, deflate by default)."""
    from etl_data_lake_spark.sources.avro_source import (
        register_avro_source,
    )

    register_avro_source(df.sparkSession)
    (
        df.write.format("avrolake")
        .option("codec", codec)
        .option(
            "sessionTimeZone",
            df.sparkSession.conf.get("spark.sql.session.timeZone", ""),
        )
        .mode(mode)
        .save(path)
    )


def read_avro_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    on_error: str = "capture",
) -> DataFrame:
    """Streaming twin of :func:`read_avro` over a landing directory
    (sources/avro_source.AvroStreamReader): each micro-batch reads
    exactly the container files that appeared since the checkpointed
    offset. Schema is REQUIRED (streaming sources cannot infer);
    policy surface identical to the batch reader."""
    if on_error not in _MODES:
        raise ValueError(f"on_error must be one of {sorted(_MODES)}")
    from etl_data_lake_spark.sources.avro_source import (
        capture_schema,
        register_avro_source,
    )

    register_avro_source(spark)
    if on_error == "capture":
        schema = capture_schema(schema)
    return (
        spark.readStream.format("avrolake")
        .schema(schema)
        .option("on_error", on_error)
        .option(
            "sessionTimeZone",
            spark.conf.get("spark.sql.session.timeZone", ""),
        )
        .load(path)
    )


def avro_stream_writer(
    df: DataFrame,
    path: str,
    checkpoint: str,
    codec: str = "deflate",
):
    """DataStreamWriter for the exactly-once avrolake sink, with the
    session timezone stamped so the instant-column UTC guard can fire
    in the session-less planning worker (direct
    ``writeStream.format("avrolake")`` users must set the
    ``sessionTimeZone`` option themselves or own the UTC contract).
    Caller picks trigger/start: ``avro_stream_writer(...)
    .trigger(availableNow=True).start()``."""
    from etl_data_lake_spark.sources.avro_source import (
        register_avro_source,
    )

    register_avro_source(df.sparkSession)
    return (
        df.writeStream.format("avrolake")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .option("codec", codec)
        .option(
            "sessionTimeZone",
            df.sparkSession.conf.get("spark.sql.session.timeZone", ""),
        )
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (clean rows without the corrupt column, quarantined rows with
    the raw record in ``_corrupt``). Use the second element as a
    dead-letter sink input (it keeps all columns — partial parses are
    diagnostic).

    The parsed scan is cached first: Spark refuses any plan whose only
    referenced scan column is the corrupt-record column (column
    pruning would otherwise skip the very parse that populates it),
    and caching the parsed batch is the documented contract for
    splitting it. In a pipeline this materialization is the same one
    the dead-letter write needs anyway.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
