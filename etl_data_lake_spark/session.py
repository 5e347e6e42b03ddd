"""SparkSession factory + runtime configuration.

Replaces the reference's ``create_spark_session`` (etl.py:25-37) which
only wired an S3 connector. Ours pins the configs that matter for
correctness (UTC session timezone — fixes reference quirk Q2, the
local-timezone Python UDF at etl.py:144-153) and for scale (AQE,
shuffle partition sizing, Arrow transfer for the Pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime (non-static) confs applied to ANY session handed to us —
# including the verify driver's. Safe to set after startup.
RUNTIME_CONFS: dict[str, str] = {
    # Oracle parity: all timestamp <-> wall-clock conversions in UTC.
    # (Spark 4.1+ reads the testdata's parquet TIMESTAMP(NANOS) ts
    # column natively as timestamp_ntz; the ≤4.0 nanosAsLong shim and
    # its bigint branch were removed in round 4 once the environment
    # settled on 4.1 — sources/catalog.load_table still probes the
    # scanned type and fails loudly on an unsupported engine.)
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones, auto-broadcast small join sides discovered at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # SIZE-derived post-shuffle partition counts (round 15): with the
    # default (true), AQE never coalesces below the session parallelism,
    # so a kilobyte-sized shuffle still schedules one near-empty task
    # per core — pure fixed overhead that made several small queries run
    # FASTER on 8 cores than 32. With false, the coalesced count comes
    # from advisoryPartitionSizeInBytes (64 MB default): small shuffles
    # collapse to a handful of tasks, and at production scale every
    # shuffle exceeds the advisory size anyway so the flag changes
    # nothing there. This is the Spark-documented recommendation for
    # busy clusters (partition count from data volume, not core count).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # Write timestamps as annotated TIMESTAMP_MICROS, not legacy INT96:
    # INT96 columns carry NO footer min/max statistics (measured), so
    # every time-range file skip and txn-manifest stat on a timestamp
    # column silently dies with the default. Micros is also what every
    # modern reader (pyarrow, DuckDB, Iceberg/Delta writers) expects.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # a conf may be static in some deployments; never fail a query
            # over a tuning knob
            pass
    try:
        # Size the shuffle to the machine iff the caller left Spark's
        # stock 200. AQE re-coalesces batch plans anyway, but stateful
        # STREAMING plans cannot use AQE — there the partition count is
        # paid as real state-store tasks per micro-batch. On a cluster
        # this would be ~2-3x total executor cores.
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            )
    except Exception:
        pass
    return spark


# Object-store (s3a://) connector surface — the reference's only
# session config is exactly this (hadoop-aws + credentials,
# etl.py:18-22, 33-37). Two deliberate changes: a current connector
# line instead of the 2015-era hadoop-aws 2.7.0, and the credential
# PROVIDER CHAIN instead of copying AWS keys from env into Spark conf
# (the reference's approach leaks secrets into logged confs and breaks
# on instance roles).
S3A_CONFS: dict[str, str] = {
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider,"
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider,"
        "com.amazonaws.auth.EnvironmentVariableCredentialsProvider"
    ),
    # committers: never rename-commit on an object store
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    # read tuning for columnar formats over HTTP range requests
    "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
    "spark.hadoop.fs.s3a.connection.maximum": "96",
}


def get_spark(
    app_name: str = "etl-data-lake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    s3a: bool = False,
) -> SparkSession:
    """Build a local session sized from $SPARK_GRAFT_CPUS.

    On a real cluster you would leave ``master`` unset and size
    ``spark.sql.shuffle.partitions`` to ~2-3x total executor cores
    (with AQE coalescing handling the small-query case).

    ``s3a=True`` adds the object-store connector configs (S3A_CONFS)
    plus the hadoop-aws package line; reading ``s3a://`` paths then
    works wherever the JVM can fetch the connector jars. Kept off by
    default: this container is offline and every testdata path is
    local.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    # Python-worker daemon with the guarded import-cache refresh
    # (fastworker.py): stock workers pay ~0.15-0.3 s of zipimport
    # directory re-reads per task via the unconditional
    # importlib.invalidate_caches() in setup_spark_files — a fixed tax
    # on EVERY Python task at any scale. The repo root rides
    # spark.executorEnv.PYTHONPATH so worker processes can import the
    # module (merged after Spark's own zip paths; appended to any
    # caller-provided PYTHONPATH).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_pythonpath = (
        os.environ["PYTHONPATH"] + os.pathsep + repo_root
        if os.environ.get("PYTHONPATH")
        else repo_root
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode: keep parquet split size default (128m); at 100 TB
        # this is the knob that balances task count vs per-task overhead.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.python.daemon.module", "etl_data_lake_spark.fastworker")
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
    )
    if s3a:
        builder = builder.config(
            "spark.jars.packages", "org.apache.hadoop:hadoop-aws:3.4.1"
        )
        for k, v in S3A_CONFS.items():
            builder = builder.config(k, v)
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
