"""Sink file-count management: bounded partitioned writes, compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_write_partitioned_bounds_files(spark, tmp_path):
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.sources.sinks import (
        data_file_count,
        write_partitioned,
    )

    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    write_partitioned(orders, out, ("year",))
    n_years = orders.select("year").distinct().count()
    # exactly one file per partition directory
    assert data_file_count(out) == n_years
    got = spark.read.parquet(out)
    assert got.count() == orders.count()


def test_naive_write_makes_more_files_than_managed(spark, tmp_path):
    """The failure mode write_partitioned exists for: many upstream
    tasks x partitions -> file explosion."""
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.sources.sinks import data_file_count

    orders = (
        load_table(spark, SF_DIR, "orders")
        .withColumn("year", F.year("o_orderdate"))
        .repartition(8)  # simulate many upstream tasks
    )
    naive = str(tmp_path / "naive")
    orders.write.mode("overwrite").partitionBy("year").parquet(naive)
    n_years = orders.select("year").distinct().count()
    assert data_file_count(naive) > n_years


def test_compact_reduces_file_count_preserving_rows(spark, tmp_path):
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.sources.sinks import compact, data_file_count

    li = load_table(spark, SF_DIR, "lineitem")
    out = str(tmp_path / "li_small_files")
    li.repartition(16).write.parquet(out)
    before = data_file_count(out)
    assert before >= 16
    n_rows = li.count()
    after = compact(spark, out, target_mb=256)
    assert after < before
    assert spark.read.parquet(out).count() == n_rows


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.sources.sinks import (
        overwrite_partitions_dynamic,
        write_partitioned,
    )

    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_dyn")
    write_partitioned(orders, out, ("year",))
    years = sorted(r.year for r in orders.select("year").distinct().collect())
    target, others = years[0], years[1:]
    before_other = (
        spark.read.parquet(out).where(F.col("year") != target).count()
    )

    # "reprocess" one year: halve it, rewrite just that partition
    redo = orders.where(F.col("year") == target).limit(10)
    overwrite_partitions_dynamic(redo, out, ("year",))

    after = spark.read.parquet(out)
    assert after.where(F.col("year") == target).count() == 10
    assert after.where(F.col("year") != target).count() == before_other
    assert sorted(
        r.year for r in after.select("year").distinct().collect()
    ) == years


def test_range_clustered_layout_enables_file_skipping(spark, tmp_path):
    """Range clustering must produce files with disjoint cluster-key
    ranges (footer min/max stats), so a point predicate prunes to ONE
    file — the data-skipping property, asserted from the actual
    parquet metadata rather than assumed."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.sources.sinks import write_range_clustered

    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_clustered")
    write_range_clustered(orders, out, ("o_custkey",), n_files=8)

    ranges = []
    for p in Path(out).rglob("*.parquet"):
        md = pq.read_metadata(p)
        idx = md.schema.names.index("o_custkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, f"file ranges overlap: ({lo_a},{hi_a}) vs {lo_b}"

    # a point predicate's key range contains exactly one file
    probe = ranges[len(ranges) // 2][0]
    containing = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(containing) == 1
    # and nothing was lost
    assert spark.read.parquet(out).count() == orders.count()


def test_swap_into_place_replaces_and_restores(tmp_path):
    """The backup-rename swap must (a) replace the table and clean up
    its backup on success, (b) restore the old table when the move of
    the new data fails — no state in which the table is simply gone."""
    import pytest

    from etl_data_lake_spark.sources.sinks import swap_into_place

    table = tmp_path / "tbl"
    table.mkdir()
    (table / "old.parquet").write_bytes(b"old")
    new = tmp_path / "new"
    new.mkdir()
    (new / "new.parquet").write_bytes(b"new")

    swap_into_place(str(new), str(table))
    assert (table / "new.parquet").read_bytes() == b"new"
    assert not (tmp_path / "tbl.old").exists()

    # failure path: source tmp missing -> move raises -> old restored
    (table / "data.parquet").write_bytes(b"v2")
    with pytest.raises(FileNotFoundError):
        swap_into_place(str(tmp_path / "missing"), str(table))
    assert (table / "data.parquet").read_bytes() == b"v2"


def test_zorder_layout_skips_on_every_cluster_column(spark, tmp_path):
    """Z-order must keep footer min/max tight for BOTH cluster columns
    — the property the single-key range layout cannot give (its second
    column's per-file span stays ~the full domain). Asserted from the
    parquet metadata: average per-file span of each z-ordered column
    must be a small fraction of its domain, enabling file skipping for
    predicates on either column independently."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from etl_data_lake_spark.sources.sinks import (
        write_range_clustered,
        write_zorder_clustered,
    )

    # two INDEPENDENT uniform dimensions so clustering one says
    # nothing about the other
    df = spark.range(0, 40_000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("y"),
    )

    def spans(path, col):
        out = []
        for p in Path(path).rglob("*.parquet"):
            md = pq.read_metadata(p)
            idx = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((max(maxs) - min(mins)) / 10_000)
        return out

    zpath = str(tmp_path / "z")
    write_zorder_clustered(df, zpath, ("x", "y"), n_files=16)
    x_spans, y_spans = spans(zpath, "x"), spans(zpath, "y")
    assert len(x_spans) > 4
    # 16 files over a 2-D z-curve ~ 4x4 grid: each file covers about a
    # quarter of each dimension (plus curve-boundary slack)
    assert sum(x_spans) / len(x_spans) < 0.55
    assert sum(y_spans) / len(y_spans) < 0.55

    # contrast: single-key range clustering leaves y unclustered
    rpath = str(tmp_path / "r")
    write_range_clustered(df, rpath, ("x",), n_files=16)
    y_unclustered = spans(rpath, "y")
    assert sum(y_unclustered) / len(y_unclustered) > 0.9

    # no rows lost, no helper columns leaked
    got = spark.read.parquet(zpath)
    assert got.count() == 40_000
    assert set(got.columns) == {"id", "x", "y"}


def test_zorder_into_txn_table_prunes_manifest_on_2d_predicate(
    spark, tmp_path
):
    """write_zorder_txn commits the Z-order layout into a TxnTable
    with per-file min/max for both cluster columns in the manifest, so
    a 2-D box predicate prunes MOST files before the reader lists a
    single footer — and the pruned read is still exact."""
    from etl_data_lake_spark.sources.sinks import write_zorder_txn
    from etl_data_lake_spark.sources.txn import TxnTable

    df = spark.range(0, 40_000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("y"),
    )
    t = TxnTable(spark, str(tmp_path / "zt"))
    v = write_zorder_txn(t, df, ("x", "y"), n_files=16)
    assert v == 1

    # a small 2-D box: a 4x4 z-grid should confine it to a few files
    box = {"x": (1000, 2000), "y": (1000, 2000)}
    kept, total = t.files_matching(box)
    assert total >= 16
    assert len(kept) <= total // 2, (len(kept), total)

    # pruning on ONE dimension alone is strictly weaker than both —
    # the 2-D manifest stats must actually compound
    kept_x, _ = t.files_matching({"x": box["x"]})
    assert len(kept) <= len(kept_x)

    # exactness: pruned read == unpruned filter
    got = sorted(
        r.id for r in t.snapshot_where_ranges(box).select("id").collect()
    )
    want = sorted(
        r.id
        for r in df.where(
            F.col("x").between(1000, 2000) & F.col("y").between(1000, 2000)
        )
        .select("id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_zorder_string_column_rank_interleave(spark, tmp_path):
    """String cluster columns Z-order by rank-interleave (sampled
    equal-frequency cut points, order-preserving): per-file string
    min/max stay tight alongside the numeric dimension, so both a 2-D
    box with a string range and a prefix predicate prune at the
    manifest — and reads stay exact."""
    from etl_data_lake_spark.sources.sinks import write_zorder_txn
    from etl_data_lake_spark.sources.txn import TxnTable

    df = spark.range(0, 40_000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
        F.format_string(
            "k%05d", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000))
        ).alias("s"),
    )
    t = TxnTable(spark, str(tmp_path / "zs"))
    v = write_zorder_txn(t, df, ("x", "s"), n_files=16)
    assert v == 1

    # per-file span of the string dimension, via the embedded number
    meta = t.snapshot_meta()
    spans = []
    for f in meta.files:
        rng = meta.file_stats[f]["s"]
        spans.append((int(rng[1][1:]) - int(rng[0][1:])) / 10_000)
    assert len(spans) >= 8
    assert sum(spans) / len(spans) < 0.55, spans

    # 2-D box: numeric range AND string range compound at the manifest
    box = {"x": (1000, 2000), "s": ("k01000", "k02000")}
    kept, total = t.files_matching(box)
    assert len(kept) <= total // 2, (len(kept), total)
    got = sorted(
        r.id for r in t.snapshot_where_ranges(box).select("id").collect()
    )
    want = sorted(
        r.id
        for r in df.where(
            "x between 1000 and 2000 and s between 'k01000' and 'k02000'"
        ).collect()
    )
    assert got == want and len(got) > 0

    # prefix predicate prunes through the same stats
    kept_p, _ = t.files_matching({"s": ("k09", "k09\U0010ffff")})
    assert len(kept_p) < total
    got_p = t.snapshot_where_prefix("s", "k09").count()
    assert got_p == df.where("s like 'k09%'").count() > 0


def test_zorder_string_nulls_and_low_cardinality(spark, tmp_path):
    """Null strings land in bucket 0 (no crash, no row loss); a
    constant string column yields no cut points and degrades to a
    single bucket."""
    from etl_data_lake_spark.sources.sinks import zorder_clustered

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.format_string("v%03d", F.pmod(F.col("id"), F.lit(500))))
        .alias("s"),
        F.lit("const").alias("c"),
    )
    out = zorder_clustered(df, ("s", "c"), n_files=4)
    assert out.count() == 1000
    assert set(out.columns) == {"id", "s", "c"}
    assert out.where("s is null").count() == 100
