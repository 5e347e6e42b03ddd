"""Persisted MinHash-LSH dedup index (dedup/incremental.py):
build-once, probe new batches against the indexed corpus without
re-shingling it, exactly-once adds, estimate quality, exact verify.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.incremental import (
    MinHashDedupIndex,
    verify_exact,
)
from etl_data_lake_spark.dedup.minhash import minhash_lsh_pairs


_CORPUS = [
    ("c1", "the quick brown fox jumps over the lazy dog near the river"),
    ("c2", "completely different text about spark and parquet tables"),
    ("c3", "a third document mentioning lakehouse transactions and logs"),
    ("c4", "yet another unrelated piece regarding tokenizer vocabularies"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture()
def idx(spark, tmp_path):
    ix = MinHashDedupIndex(spark, str(tmp_path / "ix"))
    ix.build(_df(spark, _CORPUS))
    return ix


def test_probe_finds_cross_and_intra_dups(spark, idx):
    batch = _df(
        spark,
        [
            # exact dup of c1 -> every band collides (deterministic)
            ("n0", _CORPUS[0][1]),
            # two identical novel docs -> intra pair
            ("n1", "an entirely new report on morton curves and file stats"),
            ("n2", "an entirely new report on morton curves and file stats"),
            ("n3", "totally novel content about nothing indexed before"),
        ],
    )
    got = idx.probe(batch)
    rows = {(r.doc_a, r.doc_b, r.kind): r.est_jaccard for r in got.collect()}
    assert ("n0", "c1", "cross") in rows
    assert rows[("n0", "c1", "cross")] == 1.0  # identical text
    assert ("n1", "n2", "intra") in rows
    assert rows[("n1", "n2", "intra")] == 1.0
    # the novel doc matched nothing
    assert not any(a == "n3" or b == "n3" for a, b, _ in rows)


def test_probe_matches_batch_recompute(spark, idx, tmp_path):
    """Cross candidates through the index = what a full-corpus LSH
    recompute finds between the same docs (same banding, same
    integer math) — the incremental path loses nothing."""
    batch = [
        ("n1", "the quick brown fox jumps over the lazy dog near a river"),
        ("n9", "spark and parquet tables make completely different text"),
    ]
    got = idx.probe(_df(spark, batch))
    cross = {
        (r.doc_a, r.doc_b)
        for r in got.where(F.col("kind") == "cross").collect()
    }
    full = minhash_lsh_pairs(
        _df(spark, _CORPUS + batch), threshold=0.0
    )
    # the recompute orders pairs doc_a < doc_b; the index reports
    # (new, old) — normalize to compare
    want = set()
    for r in full.collect():
        a, b = r.doc_a, r.doc_b
        if a.startswith("c") != b.startswith("c"):
            new, old = (a, b) if b.startswith("c") else (b, a)
            want.add((new, old))
    assert cross == want


def test_add_exactly_once_and_probe_after(spark, idx):
    batch = _df(
        spark,
        [("n1", "the quick brown fox jumps over the lazy dog near the river")],
    )
    idx.add(batch, app_id="ing", txn_seq=1)
    idx.add(batch, app_id="ing", txn_seq=1)  # replay: no-op
    assert (
        idx.sig_tbl.snapshot().where(F.col("doc_id") == "n1").count() == 1
    )
    assert (
        idx.post_tbl.snapshot().where(F.col("doc_id") == "n1").count()
        == idx.bands
    )
    # the added doc is now probe-visible
    got = idx.probe(
        _df(spark, [("n2", "the quick brown fox jumps over the lazy dog near the river")])
    )
    pairs = {(r.doc_a, r.doc_b) for r in got.where(F.col("kind") == "cross").collect()}
    assert ("n2", "n1") in pairs and ("n2", "c1") in pairs


def test_add_only_index_freezes_params(spark, tmp_path):
    """An index populated solely via add() publishes the meta row too
    (round-5 advice): reopening with different banding params must
    fail fast instead of silently probing an incompatible banding."""
    path = str(tmp_path / "ix_addonly")
    ix = MinHashDedupIndex(spark, path)
    ix.add(_df(spark, _CORPUS[:2]), app_id="t", txn_seq=1)
    with pytest.raises(ValueError, match="frozen"):
        MinHashDedupIndex(spark, path, bands=2, rows=2)
    # same params reopen fine and the index is probeable
    again = MinHashDedupIndex(spark, path)
    dup = _df(spark, [("b1", _CORPUS[0][1])])  # verbatim dup of c1
    assert again.probe(dup).count() >= 1


def test_params_frozen(spark, idx):
    with pytest.raises(ValueError, match="frozen"):
        MinHashDedupIndex(idx.spark, idx.path, bands=3, rows=4)
    # same params reopen fine
    again = MinHashDedupIndex(idx.spark, idx.path)
    assert again._stored_params() == (3, 12, 4, 3)


def test_probe_prunes_posting_files(spark, tmp_path):
    """The probe's gap-split ranges reach the postings manifest: with
    a clustered index and a single-doc batch, the pruned file set is
    smaller than the table."""
    docs = [
        (f"d{i}", f"document number {i} with some shared words plus "
                  f"unique token{i} alpha{i} beta{i} gamma{i}")
        for i in range(120)
    ]
    ix = MinHashDedupIndex(spark, str(tmp_path / "ix"))
    ix.build(_df(spark, docs), n_files=8)
    batch = _df(spark, [("q1", docs[7][1])])
    sh, sigs, posts = ix._sketch(batch, "text", "doc_id")
    keys = sorted(r.band_key for r in posts.select("band_key").distinct().collect())
    sh.unpersist()
    from etl_data_lake_spark.sources.txn import largest_gap_ranges

    ranges = largest_gap_ranges(keys, 64)
    keep = ix.post_tbl.files_matching_any("band_key", ranges)
    total = len(ix.post_tbl.snapshot_meta().files)
    assert len(keep) < total
    # and the probe itself finds the duplicate
    got = ix.probe(batch)
    assert ("q1", "d7") in {
        (r.doc_a, r.doc_b) for r in got.collect()
    }


def test_verify_exact_candidate_sized(spark, idx):
    # exact dup guarantees an LSH candidate; verify recovers J=1.0
    # from the original texts, shingling only the pair members
    batch = _df(spark, [("n1", _CORPUS[0][1])])
    pairs = idx.probe(batch).select("doc_a", "doc_b")
    allrows = _df(spark, _CORPUS).unionByName(batch)
    exact = verify_exact(pairs, allrows, threshold=0.0)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in exact.collect()}
    assert got.get(("n1", "c1")) == 1.0


def test_probe_empty_batch_and_missing_index(spark, idx, tmp_path):
    empty = idx.spark.createDataFrame([], "doc_id string, text string")
    assert idx.probe(empty).count() == 0
    with pytest.raises(FileNotFoundError):
        MinHashDedupIndex(idx.spark, str(tmp_path / "nope")).probe(empty)


def test_incremental_curation_pipeline_end_to_end(spark, tmp_path):
    """The steady-state 100 TB curation loop, composed from the
    pieces: raw docs land in a txn table; a CDF consumer drains each
    commit, probes the dedup index, keeps only novel docs, and
    appends survivors to a CLEAN corpus table + the index — with
    exactly-once effects under replay (v_to as txn seq). Kept set ==
    greedy first-come-kept over the arrival order."""
    from etl_data_lake_spark.sources.cdf import process_changes
    from etl_data_lake_spark.sources.txn import TxnTable

    raw = TxnTable(spark, str(tmp_path / "raw"))
    clean = TxnTable(spark, str(tmp_path / "clean"))
    ix = MinHashDedupIndex(spark, str(tmp_path / "ix"))
    state = str(tmp_path / "offset")

    texts = {
        "a": "the first unique document about spark file pruning",
        "b": "a second unique document describing deletion vectors",
        "c": "a third unique document on morton space filling curves",
    }
    batches = [
        [("d1", texts["a"]), ("d2", texts["b"])],
        [("d3", texts["a"]), ("d4", texts["c"])],   # d3 dups d1
        [("d5", texts["c"]), ("d6", texts["c"])],   # d5 dups d4; d6 dups both
    ]

    def consume(changes, v_to):
        batch = changes.where(F.col("_change_type") == "insert").select(
            "doc_id", "text"
        )
        if ix.post_tbl.snapshot_meta() is None:
            survivors = batch  # first batch: intra-dedup only below
            pairs = None
        else:
            pairs = ix.probe(batch)
        if pairs is not None:
            dup_new = pairs.where(
                (F.col("kind") == "cross") & (F.col("est_jaccard") >= 0.9)
            ).select(F.col("doc_a").alias("doc_id"))
            survivors = batch.join(
                F.broadcast(dup_new), "doc_id", "left_anti"
            )
            # intra dups: keep the lexicographically first of each pair
            intra_losers = pairs.where(
                (F.col("kind") == "intra") & (F.col("est_jaccard") >= 0.9)
            ).select(F.col("doc_b").alias("doc_id"))
            survivors = survivors.join(
                F.broadcast(intra_losers), "doc_id", "left_anti"
            )
        else:
            survivors = batch
        if ix.post_tbl.snapshot_meta() is None:
            ix.build(survivors)
        else:
            ix.add(survivors, app_id="curator-ix", txn_seq=v_to)
        clean.append(survivors, app_id="curator", txn_seq=v_to)

    for rows in batches:
        raw.append(
            spark.createDataFrame(rows, "doc_id string, text string")
            .coalesce(1)
        )
        process_changes(raw, state, consume)

    kept = sorted(r.doc_id for r in clean.snapshot().collect())
    assert kept == ["d1", "d2", "d4"]  # greedy first-come-kept
    # replaying the last batch's consume is a no-op (exactly-once)
    last_v = raw.latest_version()
    consume(raw.table_changes(last_v - 1, last_v), last_v)
    assert sorted(r.doc_id for r in clean.snapshot().collect()) == kept
    # and the clean corpus is internally near-dup-free
    full = minhash_lsh_pairs(clean.snapshot(), threshold=0.9)
    assert full.count() == 0
