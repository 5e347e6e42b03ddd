"""Parquet sinks that manage FILE COUNT, not just correctness.

The reference's ``partitionBy`` writes (etl.py:74-76, 167-169,
203-204) inherit Spark's default behavior: every upstream task opens a
file in every output partition it touches — N tasks × M partitions
small files, the layout that kills 100 TB scans (footer reads and
object-store listing dominate). Two tools:

* :func:`write_partitioned` — repartitions ON THE PARTITION COLUMNS
  (plus an optional within-partition file count) before the write, so
  each output partition is owned by a bounded number of tasks;
* :func:`compact` — rewrites an existing table to ~``target_mb``
  files per directory, the periodic maintenance job every streaming
  append sink (streaming_ingest) eventually needs.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    files_per_partition: int = 1,
) -> None:
    """Overwrite-write hive-partitioned parquet with a bounded file
    count per partition directory.

    files_per_partition > 1 adds a hash-spread second key so one huge
    partition can still parallelize its write (pick roughly
    partition_bytes / 256 MB at scale).
    """
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        spread = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        out = df.repartition(*cols, spread)
    else:
        out = df.repartition(*cols)
    (
        out.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def data_file_count(path: str) -> int:
    return sum(1 for p in Path(path).rglob("*.parquet") if p.is_file())


def swap_into_place(tmp: str, path: str) -> None:
    """Replace the table at ``path`` with ``tmp`` without a window in
    which the data is simply GONE: the old table is renamed aside
    (same-filesystem rename, atomic) before the new one moves in, and
    the backup is only deleted once the new table is in place. A crash
    between any two steps leaves either the old or the new table at a
    recoverable location — never neither (the rmtree-then-move it
    replaces stranded the new data in tmp with the table deleted).

    ``tmp`` should live on the SAME filesystem as ``path`` (create it
    as a sibling) so the move is an atomic rename; on a different
    filesystem shutil.move degrades to copy+delete, and a crash
    mid-copy leaves a partial target — which the except branch below
    removes before restoring the backup, so the live path still never
    holds a torn table. Local-FS semantics; on an object store this
    whole function becomes a table-format metadata commit
    (Delta/Iceberg)."""
    import shutil

    target = Path(path)
    backup = Path(path.rstrip("/") + ".old")
    if backup.exists():
        shutil.rmtree(backup)
    had_old = target.exists()
    if had_old:
        target.rename(backup)
    try:
        shutil.move(tmp, path)
    except BaseException:
        # a cross-filesystem move that died mid-copy leaves a partial
        # target; clear it so the live path never exposes torn data —
        # on a first-ever publish (no backup to restore) an empty live
        # path is the recoverable state, on a replace the backup then
        # moves back in
        if target.exists():
            shutil.rmtree(target)
        if had_old:
            backup.rename(target)
        raise
    if had_old:
        shutil.rmtree(backup)


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...] = (),
    target_mb: int = 256,
) -> int:
    """Rewrite a parquet table with ~target_mb output files.

    Reads, coalesces to max(total_bytes / target_mb, 1) tasks (per
    partition directory when partitioned), and atomically replaces via
    write-to-temp + rename. Returns the new file count. On object
    stores the rename step becomes a metastore/table-format swap
    (Delta/Iceberg); the sizing logic is the part that transfers.
    """
    total_bytes = sum(
        p.stat().st_size for p in Path(path).rglob("*.parquet") if p.is_file()
    )
    n_files = max(int(total_bytes / (target_mb * 1024 * 1024)), 1)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_cols:
        (
            df.repartition(n_files, *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    swap_into_place(tmp, path)
    return data_file_count(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
) -> None:
    """Range-cluster the table on ``cluster_cols`` so parquet stats
    can skip data: ``repartitionByRange`` gives each output file a
    narrow, (mostly) disjoint key range, and ``sortWithinPartitions``
    orders rows inside each file so row-group min/max stats are tight
    too. A point or range predicate on the cluster key then prunes at
    three levels — file (footer min/max), row group, and page — which
    on a 100 TB table is the difference between scanning everything
    and scanning one file. This is the poor-man's Z-order for a
    single-key workload; no table format required, plain parquet.

    The range exchange samples the key distribution, so skew in the
    cluster key yields balanced files regardless (what a naive
    hash-partition + sort cannot guarantee).
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def _string_cut_points(
    df: DataFrame, col: str, n_buckets: int, max_sample: int
) -> list[str]:
    """Up to ``n_buckets - 1`` sorted boundary values for a string
    cluster column, from a bounded deterministic sample: distinct
    values ordered by their xxhash64 (a seedless pseudo-random but
    reproducible order) with a pushed-down LIMIT, so the driver holds
    at most ``max_sample`` strings regardless of table size — the same
    bounded-training-collect pattern as IVF centroid fitting. The
    sample's sorted order yields EQUAL-FREQUENCY buckets, which for
    skewed string data keeps per-file stats tighter than any
    uniform-width scheme could."""
    vals = [
        r[0]
        for r in df.select(col)
        .where(F.col(col).isNotNull())
        .distinct()
        .orderBy(F.xxhash64(F.col(col)))
        .limit(max_sample)
        .collect()
    ]
    vals.sort()
    cuts: list[str] = []
    for i in range(1, n_buckets):
        c = vals[min(len(vals) - 1, (i * len(vals)) // n_buckets)] if vals else None
        if c is not None and (not cuts or c > cuts[-1]):
            cuts.append(c)
    return cuts


def _z_num_expr(df: DataFrame, c: str):
    """The numeric expression a Morton bucket quantizes for column
    ``c``: a plain double cast for numbers AND timestamps (epoch
    seconds — timestamps are the canonical events cluster key), and
    ``unix_date`` (epoch days) for DATE columns, which Spark refuses
    to cast to double directly. Used identically by the spec freeze
    and the key computation so the two can never disagree."""
    from pyspark.sql.types import DateType

    if isinstance(df.schema[c].dataType, DateType):
        return F.unix_date(F.col(c)).cast("double")
    return F.col(c).cast("double")


def compute_zorder_spec(
    df: DataFrame, cols: tuple[str, ...], bits: int = 8,
    max_sample: int = 4096,
) -> dict:
    """Freeze the bucketing parameters a Morton key needs — per-column
    numeric [lo, hi] (one bounded agg job) and string cut points (one
    bounded collect per string column) — as a JSON-able spec. Keys
    computed under the SAME spec are comparable across commits, which
    is what makes incremental OPTIMIZE ZORDER sound: per-file z-ranges
    recorded at write time can be interval-compared forever after.
    Values outside the frozen numeric range clamp into the edge
    buckets (clustering granularity degrades at the edges as data
    drifts; recompute the spec with a full recluster to re-tighten)."""
    from pyspark.sql.types import StringType

    if bits * len(cols) > 63:
        bits = max(63 // len(cols), 1)
    str_cols = {
        c for c in cols if isinstance(df.schema[c].dataType, StringType)
    }
    num_cols = [c for c in cols if c not in str_cols]
    spec: dict = {"cols": list(cols), "bits": bits, "num": {}, "cuts": {}}
    for c in str_cols:
        spec["cuts"][c] = _string_cut_points(df, c, 1 << bits, max_sample)
    if num_cols:
        row = df.agg(
            *[
                f
                for c in num_cols
                for f in (
                    F.min(_z_num_expr(df, c)).alias(f"_min_{c}"),
                    F.max(_z_num_expr(df, c)).alias(f"_max_{c}"),
                )
            ]
        ).collect()[0]
        for c in num_cols:
            spec["num"][c] = [row[f"_min_{c}"], row[f"_max_{c}"]]
    return spec


def zorder_key_with_spec(df: DataFrame, spec: dict) -> DataFrame:
    """Morton ``_z`` column from a FROZEN spec (see
    :func:`compute_zorder_spec`): every bucket boundary is a literal,
    so the whole key evaluates in codegen with no stats job and no
    broadcast — and two dataframes keyed under the same spec get
    comparable z values."""
    bits, cols = int(spec["bits"]), list(spec["cols"])
    n = len(cols)
    buckets = []
    for c in cols:
        if c in spec["cuts"]:
            cuts = spec["cuts"][c]
            if not cuts:
                buckets.append(F.lit(0).cast("long"))
                continue
            arr = F.array(*[F.lit(v) for v in cuts])
            b = F.size(F.filter(arr, lambda cut: cut <= F.col(c)))
            buckets.append(b.cast("long"))
            continue
        lo, hi = spec["num"][c]
        if lo is None or hi is None:
            buckets.append(F.lit(0).cast("long"))  # all-null column
            continue
        b = F.width_bucket(
            _z_num_expr(df, c),
            F.lit(float(lo)),
            F.lit(float(hi) + 1e-9),
            F.lit(1 << bits),
        ) - F.lit(1)
        clamped = F.least(F.greatest(b, F.lit(0)), F.lit((1 << bits) - 1))
        # nulls -> bucket 0 (string path's rule), so _z is never null
        # and per-file z-ranges stay interval-comparable
        buckets.append(F.coalesce(clamped, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + ci
            ).cast("long")
    return df.select(*df.columns, z.alias("_z"))


def zorder_key(
    df: DataFrame, cols: tuple[str, ...], bits: int = 8,
    max_sample: int = 4096,
) -> DataFrame:
    """Add a ``_z`` column: the Morton (Z-order) interleaving of each
    cluster column's ``bits``-bit bucket index — the multi-column
    generalization of range clustering. Sorting by ``_z`` keeps rows
    close in EVERY cluster dimension close in the file order, so
    footer min/max stats stay tight for predicates on ANY of the
    columns, not just the first sort key (the classic space-filling-
    curve layout, public since Morton 1966 and used by every lakehouse
    OPTIMIZE ZORDER implementation).

    Numeric (and timestamp) buckets are uniform-width over each
    column's observed [min, max] (``width_bucket``, JVM codegen;
    min/max ride in via a broadcast 1-row cross join — no driver
    collect). Value skew therefore skews bucket occupancy, but file
    BALANCE is unaffected: the subsequent ``repartitionByRange(_z)``
    samples the z distribution itself. Skew only coarsens skipping
    granularity inside hot buckets.

    STRING columns bucket by RANK-INTERLEAVE instead: order-preserving
    equal-frequency buckets against sampled cut points (see
    :func:`_string_cut_points`; the sample is bounded by
    ``max_sample`` values collected once per string column), assigned
    JVM-side as "number of cut points <= value" over a literal sorted
    array — nulls land in bucket 0. Order preservation is what keeps
    string min/max stats tight per file, so prefix predicates
    (``snapshot_where_prefix``) and range predicates prune; a hash
    bucket would destroy exactly that.

    ``bits`` is auto-reduced so the interleaved key fits a signed
    long: bits·len(cols) ≤ 63 (e.g. 10 cluster columns get 6 bits
    each). Beyond that the Morton positions would silently overflow
    and corrupt the clustering order.
    """
    from pyspark.sql.types import StringType

    if bits * len(cols) > 63:
        bits = max(63 // len(cols), 1)
    str_cols = {
        c for c in cols if isinstance(df.schema[c].dataType, StringType)
    }
    num_cols = [c for c in cols if c not in str_cols]
    cut_points = {
        c: _string_cut_points(df, c, 1 << bits, max_sample)
        for c in str_cols
    }
    n = len(cols)
    if num_cols:
        stats = df.agg(
            *[
                f
                for c in num_cols
                for f in (
                    F.min(_z_num_expr(df, c)).alias(f"_min_{c}"),
                    F.max(_z_num_expr(df, c)).alias(f"_max_{c}"),
                )
            ]
        )
        with_stats = df.crossJoin(F.broadcast(stats))
    else:
        with_stats = df
    buckets = []
    for c in cols:
        if c in str_cols:
            cuts = cut_points[c]
            if not cuts:
                buckets.append(F.lit(0))
                continue
            # bucket = |{cut : cut <= value}| over the sorted literal
            # array — 0..len(cuts) <= 2^bits - 1, order-preserving,
            # evaluated in codegen; null value -> no cut qualifies -> 0
            arr = F.array(*[F.lit(v) for v in cuts])
            b = F.size(F.filter(arr, lambda cut: cut <= F.col(c)))
            buckets.append(b.cast("long"))
            continue
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        # width_bucket returns 1..2^bits inside [lo, hi); clamp the
        # hi endpoint (returns 2^bits+1) and degenerate lo==hi tables
        b = F.width_bucket(
            _z_num_expr(df, c), lo, hi + F.lit(1e-9), F.lit(1 << bits)
        ) - F.lit(1)
        buckets.append(
            F.least(F.greatest(b, F.lit(0)), F.lit((1 << bits) - 1))
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + ci
            ).cast("long")
    return with_stats.select(*df.columns, z.alias("_z"))


def zorder_clustered(
    df: DataFrame,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
    bits: int = 8,
) -> DataFrame:
    """The Z-order layout as a TRANSFORMATION: range-partitioned and
    sorted by the Morton key, key dropped — ready for any sink. Both
    :func:`write_zorder_clustered` (plain parquet) and
    :func:`write_zorder_txn` (transactional commit) stage exactly
    this."""
    keyed = zorder_key(df, cluster_cols, bits)
    return (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Z-order-clustered parquet: range-partition and sort by the
    Morton key so every cluster column's footer min/max is tight in
    every file. Use over :func:`write_range_clustered` when queries
    filter on MORE THAN ONE column; the single-key layout gives one
    perfectly-clustered column and leaves the rest unclustered,
    while Z-order trades a little per-column tightness for tightness
    on all of them."""
    zorder_clustered(df, cluster_cols, n_files, bits).write.mode(
        "overwrite"
    ).parquet(path)


def write_zorder_txn(
    table,
    df: DataFrame,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> int:
    """Commit a Z-order-clustered layout INTO a transactional table
    (sources.txn.TxnTable), recording per-file min/max for every
    cluster column in the manifest. The combination stacks three
    pruning levels for multi-column predicates: manifest stats (the
    reader never lists non-matching files — TxnTable.snapshot_where_
    ranges), parquet footer min/max, and row-group/page stats — with
    ACID publish and time travel on top. ``mode`` is 'overwrite'
    (re-cluster the table, the OPTIMIZE ZORDER shape) or 'append'.
    Returns the committed version."""
    clustered = zorder_clustered(df, cluster_cols, n_files, bits)
    stats = tuple(cluster_cols)
    if mode == "overwrite":
        return table.overwrite(clustered, stats_cols=stats)
    if mode == "append":
        return table.append(clustered, stats_cols=stats)
    raise ValueError(f"mode {mode!r} not in ('overwrite', 'append')")


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: tuple[str, ...]
) -> None:
    """Overwrite ONLY the hive partitions present in ``df``, leaving
    every other partition directory untouched — the idempotent
    'reprocess one month' operation the reference can't do (its writes
    either crash on rerun, quirk Q9, or would wipe the whole table
    under mode=overwrite).

    Uses Spark's dynamic partitionOverwriteMode scoped to this write;
    the session-level setting is restored afterwards so callers keep
    their own semantics.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set(key, old)
