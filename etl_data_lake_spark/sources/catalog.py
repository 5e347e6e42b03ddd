"""Source catalog for the driver testdata (TPC-H-ish star schema).

The reference reads schemaless JSON (etl.py:61-64, 120-124), paying a
schema-inference job per read; we pin explicit schemas so the scan
starts immediately and column pruning reaches the parser. Our testdata
is Parquet (self-describing), but we still normalize the one awkward
physical type — ``events.ts`` is parquet TIMESTAMP(NANOS), which
Spark 4.1+ reads natively as ``timestamp_ntz``; ``load_table`` pins
exactly that type (and rejects older engines) so every downstream
operator sees wall-clock semantics identical to the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# TPC-H fixes region at 5 rows and nation at 25 rows regardless of SF,
# and supplier/part/customer stay several orders of magnitude below the
# fact table. Join helpers consult this set for broadcast hints.
BROADCASTABLE = {"region", "nation", "supplier", "part", "customer"}


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input scan
    has fewer source files than cores — for CPU-heavy fan-out stages
    (shingling, vector math) fed by a small file count. A 5 MB parquet
    arrives as ONE task; exploding it 50x on one core wastes 31.

    The decision reads ``inputFiles()`` — file-index metadata, no RDD
    conversion (the ``df.rdd.getNumPartitions()`` probe forces
    physical planning on the driver per call). File count lower-bounds
    scan splits, so at 100 TB (thousands of files) this is a no-op;
    when files < cores the input is either small (shuffle is cheap by
    construction) or a few huge files feeding a CPU-heavy stage — the
    one case where paying the repartition is exactly right. Non-file
    sources (createDataFrame fixtures, derived/shuffled inputs) report
    ZERO files — for those the file probe says nothing, so fall back
    to cheaper probes (an unconditional shuffle here would REDUCE the
    parallelism of already-wide derived inputs): a file-less plan that
    already contains a shuffle-inducing operator (Join / Aggregate /
    Window / Sort / Repartition / Deduplicate) is governed by
    ``spark.sql.shuffle.partitions`` + AQE and is left alone — the
    ANALYZED logical plan is already materialized on the DataFrame, so
    inspecting it costs a tree walk, not the physical planning that
    ``df.rdd.getNumPartitions()`` forces per call. The rdd probe
    remains only as the last resort for narrow file-less leaves
    (createDataFrame fixtures), where the plan says nothing about
    parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files == 0:
        try:
            import re as _re

            plan = df._jdf.queryExecution().analyzed().toString()
            # operator NODES only: anchored to the start of a tree
            # line (after the +-/:- branch art), so a column alias
            # like `SortKey#12` or a view named `Joined` can't
            # false-positive the probe
            if _re.search(
                r"(?m)^[\s+:|-]*(Join|Aggregate|Window|Sort|"
                r"Repartition|RepartitionByExpression|Deduplicate)\b",
                plan,
            ):
                return df
        except Exception:
            pass
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target)
    if n_files >= target:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical quirks.

    ``events.ts``: parquet TIMESTAMP(NANOS), which Spark 4.1+ reads
    natively as ``timestamp_ntz`` (micros-truncated) — normalized to
    exactly that type so downstream operators and the DuckDB oracle
    see one schema. The probe stays (one schema lookup, no data read)
    so an engine that yields anything else — e.g. Spark ≤4.0, which
    only exposes NANOS through the ``nanosAsLong`` bigint shim this
    repo dropped in round 4 — fails loudly here instead of feeding
    epoch-longs into timestamp logic.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type not in ("timestamp_ntz", "timestamp"):
            raise TypeError(
                f"events.ts scanned as {ts_type}; this build expects "
                "Spark 4.1+'s native TIMESTAMP(NANOS) read "
                "(timestamp_ntz)"
            )
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` workloads."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
