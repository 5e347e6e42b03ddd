"""Deterministic shuffled-shard export (operators/export.py): shard
membership and within-shard order are pure functions of (content,
seed); the on-disk layout is one parquet file per shard directory in
the shuffled order a sequential dataloader consumes."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.export import (
    assign_shuffled_shards,
    shuffled,
    write_shuffled_shards,
)

N = 10_000
SHARDS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    # ingest-ordered corpus: ids arrive clustered (sorted), the exact
    # layout a shuffle must destroy
    return spark.range(0, N).select(
        F.col("id"), F.concat(F.lit("doc"), F.col("id")).alias("key")
    )


def test_assignment_deterministic_and_balanced(spark, corpus):
    a = assign_shuffled_shards(corpus, SHARDS, ("key",))
    b = assign_shuffled_shards(corpus.repartition(17), SHARDS, ("key",))
    assert (
        a.select("id", "shard")
        .exceptAll(b.select("id", "shard"))
        .count()
        == 0
    )
    sizes = [
        r["n"]
        for r in a.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == SHARDS
    assert all(abs(s - N / SHARDS) < 0.2 * N / SHARDS for s in sizes)


def test_shuffled_order_is_not_ingest_order(spark, corpus):
    rows = shuffled(corpus, SHARDS, ("key",)).collect()
    assert len(rows) == N
    # within the first consumed shard, ids must not come out sorted
    first_shard = rows[0]["shard"]
    ids = [r["id"] for r in rows if r["shard"] == first_shard]
    assert ids != sorted(ids)


def test_export_one_file_per_shard_exact_rows(spark, corpus, tmp_path):
    out = str(tmp_path / "export")
    write_shuffled_shards(corpus, out, SHARDS, ("key",))
    files = sorted(glob.glob(f"{out}/shard=*/*.parquet"))
    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(dirs) == SHARDS
    assert len(files) == SHARDS  # exactly one file per shard
    seen = []
    for f in files:
        seen.extend(pq.read_table(f).column("id").to_pylist())
    assert sorted(seen) == list(range(N))  # every row exactly once


def test_export_order_reproducible_across_runs(spark, corpus, tmp_path):
    out1, out2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_shuffled_shards(corpus, out1, SHARDS, ("key",))
    write_shuffled_shards(corpus.repartition(13), out2, SHARDS, ("key",))
    for k in range(SHARDS):
        f1 = glob.glob(f"{out1}/shard={k}/*.parquet")
        f2 = glob.glob(f"{out2}/shard={k}/*.parquet")
        ids1 = pq.read_table(f1[0]).column("id").to_pylist()
        ids2 = pq.read_table(f2[0]).column("id").to_pylist()
        assert ids1 == ids2  # same membership AND same order


def test_new_seed_is_a_fresh_permutation(spark, corpus, tmp_path):
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_shuffled_shards(corpus, out1, SHARDS, ("key",), seed=1)
    write_shuffled_shards(corpus, out2, SHARDS, ("key",), seed=2)
    f1 = sorted(glob.glob(f"{out1}/shard=*/*.parquet"))
    f2 = sorted(glob.glob(f"{out2}/shard=*/*.parquet"))
    order1 = [i for f in f1 for i in pq.read_table(f).column("id").to_pylist()]
    order2 = [i for f in f2 for i in pq.read_table(f).column("id").to_pylist()]
    assert sorted(order1) == sorted(order2) == list(range(N))
    assert order1 != order2


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="n_shards"):
        assign_shuffled_shards(corpus, 0, ("key",))
    tagged = assign_shuffled_shards(corpus, 2, ("key",))
    with pytest.raises(ValueError, match="shard"):
        assign_shuffled_shards(tagged, 2, ("key",))
    # a user column named like the hidden order key would be silently
    # overwritten and then dropped by shuffled() — reject it too
    with pytest.raises(ValueError, match="_shuffle_order"):
        assign_shuffled_shards(
            corpus.withColumn("_shuffle_order", F.lit(1)), 2, ("key",)
        )


def test_shards_map_near_one_to_one_to_tasks(spark, corpus):
    """Range partitioning on the shard id gives a ~1:1 shard-to-task
    layout (hash partitioning collided distinct shards into the same
    task, idling ~1/e of the export parallelism — review regression).
    Every shard lands entirely in one task, and occupancy is at worst
    one boundary merge below full (range sampling may fuse ONE
    adjacent pair; hash averaged ~5.2 of 8 occupied)."""
    s = shuffled(corpus, SHARDS, ("key",)).withColumn(
        "pid", F.spark_partition_id()
    )
    pairs = s.select("shard", "pid").distinct().collect()
    assert len(pairs) == SHARDS  # each shard entirely in one task
    assert len({p["pid"] for p in pairs}) >= SHARDS - 1


# ---------------------------------------------------------------------------
# Curriculum (score-ordered) export — round-8 verdict #7
# ---------------------------------------------------------------------------

from etl_data_lake_spark.operators.export import (  # noqa: E402
    assign_curriculum_shards,
    curriculum,
    write_curriculum_shards,
)


@pytest.fixture(scope="module")
def scored_corpus(spark):
    # deterministic non-monotone score decorrelated from ingest order
    return spark.range(0, N).select(
        F.col("id"),
        F.concat(F.lit("doc"), F.col("id")).alias("key"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(10_000)) / 100.0).alias(
            "score"
        ),
    )


def test_curriculum_cross_shard_monotone_and_balanced(spark, scored_corpus):
    tagged = assign_curriculum_shards(
        scored_corpus, SHARDS, "score", ("key",)
    )
    stats = (
        tagged.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.min("score").alias("lo"),
            F.max("score").alias("hi"),
        )
        .orderBy("shard")
        .collect()
    )
    assert [r["shard"] for r in stats] == list(range(SHARDS))
    # global monotonicity across shard indices (ties may touch)
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] <= b["lo"]
    sizes = [r["n"] for r in stats]
    assert all(abs(s - N / SHARDS) < 0.1 * N / SHARDS for s in sizes)


def test_curriculum_reproducible_under_any_layout(spark, scored_corpus):
    a = assign_curriculum_shards(scored_corpus, SHARDS, "score", ("key",))
    b = assign_curriculum_shards(
        scored_corpus.repartition(17), SHARDS, "score", ("key",)
    )
    assert (
        a.select("id", "shard").exceptAll(b.select("id", "shard")).count()
        == 0
    )


def test_curriculum_constant_score_still_balances(spark):
    df = spark.range(0, 4000).select(
        F.col("id"), F.lit(1.0).alias("score")
    )
    tagged = assign_curriculum_shards(df, 4, "score", ("id",))
    sizes = [
        r["n"]
        for r in tagged.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == 4
    assert all(abs(s - 1000) < 150 for s in sizes)  # hash tie-split


def test_curriculum_descending_and_validation(spark, scored_corpus):
    tagged = assign_curriculum_shards(
        scored_corpus, 4, "score", ("key",), ascending=False
    )
    stats = (
        tagged.groupBy("shard")
        .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
        .orderBy("shard")
        .collect()
    )
    for a, b in zip(stats, stats[1:]):
        assert a["lo"] >= b["hi"]  # shard 0 = highest scores

    with pytest.raises(ValueError, match="n_shards"):
        assign_curriculum_shards(scored_corpus, 0, "score", ("key",))
    with pytest.raises(ValueError, match="null/NaN"):
        bad = scored_corpus.withColumn(
            "score",
            F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("score")),
        )
        assign_curriculum_shards(bad, 4, "score", ("key",))
    with pytest.raises(ValueError, match="already has"):
        assign_curriculum_shards(
            scored_corpus.withColumn("shard", F.lit(1)), 4, "score", ("key",)
        )
    # empty input: single empty shard assignment, no crash
    empty = assign_curriculum_shards(
        scored_corpus.where(F.lit(False)), 4, "score", ("key",)
    )
    assert empty.count() == 0


def test_curriculum_export_reads_back_in_global_score_order(
    spark, scored_corpus, tmp_path
):
    """The on-disk contract: reading shard dirs 0..n−1 sequentially
    (pyarrow preserves file row order) yields a globally score-sorted
    corpus with exactly the input rows; a second export is
    byte-identical (reproducibility across runs)."""
    out = str(tmp_path / "curr")
    write_curriculum_shards(
        scored_corpus, out, SHARDS, "score", ("key",)
    )
    seq = []
    n_rows = 0
    for k in range(SHARDS):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == 1  # one file per shard
        t = pq.read_table(files[0])
        seq.extend(t.column("score").to_pylist())
        n_rows += t.num_rows
    assert n_rows == N
    assert seq == sorted(seq)  # GLOBAL curriculum order

    out2 = str(tmp_path / "curr2")
    write_curriculum_shards(
        scored_corpus.repartition(13), out2, SHARDS, "score", ("key",)
    )
    for k in range(SHARDS):
        a = pq.read_table(glob.glob(f"{out}/shard={k}/*.parquet")[0])
        b = pq.read_table(glob.glob(f"{out2}/shard={k}/*.parquet")[0])
        assert a.equals(b)


# ---------------------------------------------- manifest (round 9) --


def test_shuffled_export_manifest(spark, tmp_path):
    from etl_data_lake_spark.operators.export import (
        MANIFEST_NAME,
        read_export_manifest,
        write_shuffled_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    path = str(tmp_path / "exp")
    write_shuffled_shards(df, path, 4, ("doc_id",), seed=7, manifest=True)
    m = read_export_manifest(path)
    assert m["kind"] == "shuffled"
    assert m["params"] == {
        "n_shards": 4, "key_cols": ["doc_id"], "seed": 7,
    }
    assert m["total_rows"] == 200
    assert m["n_shards_written"] == 4
    # footer counts must equal actual per-shard reads
    for s in m["shards"]:
        got = (
            spark.read.parquet(f"{path}/shard={s['shard']}").count()
        )
        assert got == s["n_rows"]
        assert len(s["files"]) == 1  # one file per shard
    # the exported schema, minus the shard partition column
    assert m["columns"] == [
        {"name": "doc_id", "type": "bigint"},
        {"name": "text", "type": "string"},
    ]
    # Spark partition discovery ignores the underscore sidecar
    assert spark.read.parquet(path).count() == 200
    # re-export: identical manifest apart from physical file names
    path2 = str(tmp_path / "exp2")
    write_shuffled_shards(df, path2, 4, ("doc_id",), seed=7, manifest=True)
    m2 = read_export_manifest(path2)
    strip = lambda d: {
        k: ([{x: s[x] for x in s if x != "files"} for s in v]
            if k == "shards" else v)
        for k, v in d.items()
    }
    assert strip(m) == strip(m2)
    assert (tmp_path / "exp" / MANIFEST_NAME).exists()


def test_curriculum_export_manifest(spark, tmp_path):
    from etl_data_lake_spark.operators.export import (
        read_export_manifest,
        write_curriculum_shards,
    )

    df = spark.createDataFrame(
        [(i, float(i % 37)) for i in range(300)],
        "doc_id long, score double",
    )
    path = str(tmp_path / "cur")
    write_curriculum_shards(
        df, path, 3, "score", ("doc_id",), manifest=True
    )
    m = read_export_manifest(path)
    assert m["kind"] == "curriculum"
    assert m["params"]["score_col"] == "score"
    assert m["params"]["ascending"] is True
    assert m["total_rows"] == 300 and m["n_shards_written"] == 3
    sizes = [s["n_rows"] for s in m["shards"]]
    assert sum(sizes) == 300 and max(sizes) - min(sizes) <= 2


def test_manifest_uri_write_read_symmetry(spark, tmp_path):
    """A ``scheme://`` export path round-trips through the SAME
    pyarrow FileSystem dispatch on write and read (round-10 advice
    item: the reader was os.path-only, so an object-store manifest
    the writer produced couldn't be read back). file:// exercises the
    from_uri branch end to end without needing a real object store."""
    from etl_data_lake_spark.operators.export import (
        read_export_manifest,
        write_shuffled_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    uri = f"file://{tmp_path}/exp_uri"
    write_shuffled_shards(df, uri, 2, ("doc_id",), seed=7, manifest=True)
    m = read_export_manifest(uri)
    assert m["kind"] == "shuffled" and m["total_rows"] == 50
    # and the same export reads identically through the local path
    assert read_export_manifest(f"{tmp_path}/exp_uri") == m


def test_manifest_validation(tmp_path):
    import json

    from etl_data_lake_spark.operators.export import (
        MANIFEST_NAME,
        read_export_manifest,
    )

    d = tmp_path / "bad"
    d.mkdir()
    (d / MANIFEST_NAME).write_text(json.dumps({"format": "other"}))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not an export manifest"):
        read_export_manifest(str(d))
    (d / MANIFEST_NAME).write_text(
        json.dumps({"format": "etl-data-lake-export", "version": 9})
    )
    with _pytest.raises(ValueError, match="version"):
        read_export_manifest(str(d))
