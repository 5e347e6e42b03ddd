"""Degenerate-input hardening: every operator family returns an empty
(not crashed) result on empty input — the property that matters when
a 100 TB run's partition filter legitimately selects nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_docs(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    return load_table(spark, SF_DIR, "documents").where(F.lit(False))


def test_dedup_family_on_empty(spark, empty_docs):
    from etl_data_lake_spark.dedup.jaccard import jaccard_pairs, shingle_table
    from etl_data_lake_spark.dedup.minhash import minhash_lsh_pairs
    from etl_data_lake_spark.dedup.simhash import simhash_table

    assert minhash_lsh_pairs(empty_docs).count() == 0
    assert simhash_table(empty_docs).count() == 0
    assert jaccard_pairs(shingle_table(empty_docs)).count() == 0


def test_similarity_on_empty_queries(spark):
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.lsh import lsh_bucket_topk
    from etl_data_lake_spark.sources.catalog import load_table

    from etl_data_lake_spark.similarity.ivf import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    none = emb.where(F.lit(False))
    assert cosine_topk(emb, none).count() == 0
    assert lsh_bucket_topk(emb, none).count() == 0
    # empty CORPUS with live queries must also be empty, not error
    assert cosine_topk(none, emb.limit(2)).count() == 0
    assert ivf_topk(none, emb.limit(2)).count() == 0


def test_sessionize_and_multimodal_on_empty(spark, empty_docs):
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.multimodal.decode import decode_metadata
    from etl_data_lake_spark.operators.windows import sessionize
    from etl_data_lake_spark.sources.catalog import load_table

    events = load_table(spark, SF_DIR, "events").where(F.lit(False))
    assert sessionize(events, "user_id", "ts", 30).count() == 0
    media = fake_media_table(empty_docs)
    assert decode_metadata(media).count() == 0


def test_pipeline_builders_on_empty(spark):
    from etl_data_lake_spark.pipeline.schemas import LOG_SCHEMA, SONG_SCHEMA
    from etl_data_lake_spark.pipeline.tables import (
        build_artists,
        build_songplays,
        build_songs,
        build_time,
        build_users,
    )

    song = spark.createDataFrame([], SONG_SCHEMA)
    log = spark.createDataFrame([], LOG_SCHEMA)
    songs, artists = build_songs(song), build_artists(song)
    assert songs.count() == 0 and artists.count() == 0
    assert build_users(log).count() == 0
    assert build_time(log).count() == 0
    assert build_songplays(log, songs, artists).count() == 0


def test_contamination_on_empty_sides(spark, empty_docs):
    """Decontamination degrades cleanly when either corpus side is
    empty: no spans, zero-ratio stats, excision passes text through."""
    from etl_data_lake_spark.dedup.contamination import (
        contaminated_spans,
        contamination_stats,
        excise_spans,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(5)
    # empty reference: nothing to leak from
    spans = contaminated_spans(docs, empty_docs, w=8)
    assert spans.count() == 0
    assert contamination_stats(docs, empty_docs, w=8).where(
        F.col("dup_ratio") != 0.0
    ).count() == 0
    # empty train: nothing to mark
    assert contaminated_spans(empty_docs, docs, w=8).count() == 0
    # excision with an empty span table is the identity on text
    out = {r.doc_id: r.text for r in excise_spans(docs, spans).collect()}
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert out == orig


def test_round5_lakehouse_ops_on_empty_table(spark, tmp_path):
    """Round-5 surfaces degrade to no-ops on empty/absent tables."""
    from etl_data_lake_spark.sources.txn import TxnTable

    t = TxnTable(spark, str(tmp_path / "t"))
    # absent table: every DML no-ops at version 0
    assert t.delete_where_expr("1 = 1") == 0
    assert t.update_where_expr("1 = 1", {"x": "1"}) == 0
    assert t.delete_where_expr_mor("1 = 1") == 0
    assert t.optimize_zorder(("x",)) == 0
    assert t.analyze_stats(("x",)) == 0
    # schema-only table (zero-row append): still no crashes
    t.append(spark.createDataFrame([], "x int, v string"))
    v = t.latest_version()
    assert t.delete_where_expr("x = 1") == v
    assert t.optimize_zorder(("x",)) == v  # no files -> nothing to do
    assert t.analyze_stats(("x",)) == v
    # zero-row clustered append after a real optimize
    t.append(
        spark.createDataFrame([(1, "a")], "x int, v string").coalesce(1),
        stats_cols=("x",),
    )
    t.optimize_zorder(("x",))
    t.append_clustered(spark.createDataFrame([], "x int, v string"))
    assert t.snapshot().count() == 1


def test_late_round5_ops_on_empty(spark, empty_docs, tmp_path):
    import glob
    import math

    from etl_data_lake_spark.functions.lm import (
        perplexity_filter,
        perplexity_score,
        train_unigram_lm,
    )
    from etl_data_lake_spark.operators.export import write_shuffled_shards
    from etl_data_lake_spark.operators.profile import (
        numeric_histogram,
        profile,
    )
    from etl_data_lake_spark.operators.sampling import resample_to_mixture
    from etl_data_lake_spark.sources.catalog import load_table

    # mixture: no rows -> no rates -> empty kept frame
    assert (
        resample_to_mixture(
            empty_docs, {"src0": 0.5, "src1": 0.5}, "source", ("doc_id",)
        ).count()
        == 0
    )
    # profile: one row per requested column even with zero data rows
    rows = {r["column"]: r for r in profile(empty_docs).collect()}
    assert set(rows) == set(empty_docs.columns)
    assert all(r["n_rows"] == 0 for r in rows.values())
    assert numeric_histogram(empty_docs, "n_chars", 4, 0, 10).count() == 0
    # LM: empty reference trains a degenerate-but-defined model
    # (denom = alpha, oov logp 0); scoring and filtering still run
    model, oov = train_unigram_lm(empty_docs, vocab_size=10)
    assert model.count() == 0 and oov == pytest.approx(math.log(1.0))
    docs = load_table(spark, SF_DIR, "documents").limit(3)
    assert perplexity_score(docs, model, oov).count() == 3
    assert perplexity_filter(empty_docs, model, oov, 100.0).count() == 0
    # export of nothing: no files, no crash
    out = str(tmp_path / "empty_shards")
    write_shuffled_shards(empty_docs, out, 4, ("doc_id",))
    assert glob.glob(f"{out}/shard=*/*.parquet") == []


def test_round8_operators_on_empty(spark, empty_docs):
    from etl_data_lake_spark.functions.bpe import (
        bpe_token_counts,
        learn_bpe,
    )
    from etl_data_lake_spark.functions.classifier import (
        classifier_eval,
        hashed_features,
        nb_quality_filter,
        nb_quality_scores,
    )
    from etl_data_lake_spark.similarity.hnsw import hnsw_topk
    from etl_data_lake_spark.sources.catalog import load_table

    # BPE: nothing to learn from -> empty merges; counting with an
    # empty table (or empty docs) stays empty/zero, never crashes
    merges = learn_bpe(empty_docs, n_merges=5)
    assert merges == []
    assert bpe_token_counts(empty_docs, merges).count() == 0

    # classifier: empty corpus scores/filters to empty; the eval of
    # an empty frame is one all-degenerate row (nulls, zero counts)
    assert hashed_features(empty_docs).count() == 0
    assert nb_quality_scores(empty_docs).count() == 0
    assert nb_quality_filter(empty_docs).count() == 0
    ev = classifier_eval(
        spark.createDataFrame([], "y long, prob double")
    ).collect()
    assert len(ev) == 1 and ev[0]["n"] == 0 and ev[0]["auc"] is None

    # hnsw: empty corpus with live queries, and empty queries
    emb = load_table(spark, SF_DIR, "embeddings")
    none = emb.where(F.lit(False))
    assert hnsw_topk(none, emb.limit(2)).count() == 0
    assert hnsw_topk(emb, none).count() == 0


def test_avro_round8_on_empty(spark, tmp_path):
    from etl_data_lake_spark.sources.readers import read_avro, write_avro

    # zero-row write still creates a readable (empty) target
    df = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s")
    write_avro(df.coalesce(1), str(tmp_path / "t"))
    import os

    if os.path.isdir(tmp_path / "t") and os.listdir(tmp_path / "t"):
        back = read_avro(
            spark, str(tmp_path / "t"), df.schema, on_error="fail"
        )
        assert back.count() == 0


def test_round9_ops_on_empty(spark, empty_docs, tmp_path):
    import pytest as _pytest

    from etl_data_lake_spark.functions.calibration import (
        IsotonicModel,
        fit_isotonic,
        fit_isotonic_by,
        isotonic_calibrate,
    )
    from etl_data_lake_spark.functions.hybrid import hybrid_search, rrf_fuse
    from etl_data_lake_spark.functions.unigram import (
        learn_unigram,
        unigram_token_counts,
    )
    from etl_data_lake_spark.operators.diff import (
        corpus_diff,
        corpus_diff_summary,
    )
    from etl_data_lake_spark.operators.export import (
        assign_curriculum_shards,
        write_curriculum_shards,
    )
    from etl_data_lake_spark.operators.sampling import split_leakage_safe
    from etl_data_lake_spark.operators.sketches import heavy_hitters
    from etl_data_lake_spark.similarity.metrics import retrieval_metrics

    # unigram: empty corpus -> empty model; counting stays zero
    m = learn_unigram(empty_docs, vocab_size=10)
    assert m.logp == {}
    assert unigram_token_counts(empty_docs, m).count() == 0

    # isotonic: empty fit -> midpoint map; applying never crashes
    empty_scored = spark.createDataFrame([], "y long, prob double")
    iso = fit_isotonic(empty_scored, bins=4)
    assert len(iso.values) == 4
    assert isotonic_calibrate(empty_scored, iso).count() == 0
    assert fit_isotonic_by(
        spark.createDataFrame([], "g string, y long, prob double"), "g"
    ) == {}

    # hybrid: no term matches -> empty candidates -> empty result;
    # rrf over empty rankings -> empty
    emb0 = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert hybrid_search(
        empty_docs, emb0, ["zzz"], [1.0], k=3, n_candidates=5
    ).count() == 0
    r0 = spark.createDataFrame([], "doc_id long, rank long")
    assert rrf_fuse([r0]).count() == 0

    # diff: both sides empty -> empty detail, all-zero summary
    e = empty_docs.select("doc_id", "text")
    assert corpus_diff(e, e, ("doc_id",)).count() == 0
    s = {
        r.diff_status: r.n
        for r in corpus_diff_summary(e, e, ("doc_id",)).collect()
    }
    assert s == {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}

    # heavy hitters: empty input -> empty output
    assert heavy_hitters(
        spark.createDataFrame([], "item string"), "item"
    ).count() == 0

    # curriculum: empty corpus -> everything shard 0 / empty export
    tagged = assign_curriculum_shards(
        spark.createDataFrame([], "doc_id long, score double"),
        3, "score", ("doc_id",),
    )
    assert tagged.count() == 0
    write_curriculum_shards(
        spark.createDataFrame([], "doc_id long, score double"),
        str(tmp_path / "c0"), 3, "score", ("doc_id",),
    )

    # leakage-safe split: empty corpus and empty pairs partition to
    # empty splits
    p0 = spark.createDataFrame([], "doc_a long, doc_b long")
    splits = split_leakage_safe(e, p0, {"train": 0.5, "test": 0.5})
    assert all(f.count() == 0 for f in splits.values())

    # retrieval metrics: empty qrels -> empty per-query frame
    res0 = spark.createDataFrame(
        [], "query_id long, neighbor_id long, rank long"
    )
    q0 = spark.createDataFrame([], "query_id long, doc_id long")
    assert retrieval_metrics(res0, q0, k=3).count() == 0


def test_round10_s2_ops_on_empty(spark, empty_docs):
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.multimodal.phash import (
        dhash_images,
        image_near_dup_pairs,
        phash_near_dup_pairs,
    )
    from etl_data_lake_spark.operators.joins import interval_join
    from etl_data_lake_spark.operators.pagerank import pagerank
    from etl_data_lake_spark.operators.sketches import (
        distinct_overlap,
        qdigest_collect,
        qdigest_sketch,
    )
    from etl_data_lake_spark.similarity.bq import bq_topk
    from etl_data_lake_spark.sources.catalog import load_table

    # interval join: empty points / empty intervals
    events = load_table(spark, SF_DIR, "events")
    none_ev = events.where(F.lit(False))
    iv = events.groupBy("user_id").agg(
        F.min("ts").alias("s"),
        (F.min("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    assert interval_join(
        none_ev, iv, point_ts="ts", start_col="s", end_col="e",
        on=("user_id",),
    ).count() == 0
    assert interval_join(
        events, iv.where(F.lit(False)), point_ts="ts",
        start_col="s", end_col="e", on=("user_id",),
    ).count() == 0

    # binary quantization: empty queries (empty corpus raises in
    # train_bq, pinned in test_bq)
    emb = load_table(spark, SF_DIR, "embeddings")
    assert bq_topk(emb, emb.where(F.lit(False)), k=5).count() == 0

    # perceptual hash: empty media, empty hash table
    media = fake_media_table(empty_docs)
    assert dhash_images(media).count() == 0
    assert image_near_dup_pairs(media).count() == 0
    empty_hashes = spark.createDataFrame([], "media_id long, dhash long")
    assert phash_near_dup_pairs(empty_hashes).count() == 0

    # audio fingerprint (round 12): same sweep one modality over
    from etl_data_lake_spark.multimodal.afp import (
        audio_fingerprints,
        audio_near_dup_pairs,
    )

    assert audio_fingerprints(media).count() == 0
    assert audio_near_dup_pairs(media).count() == 0

    # q-digest: empty sketch collects to an empty reader (quantile
    # raises — pinned in test_sketches)
    empty_longs = spark.createDataFrame([], "x long")
    r = qdigest_collect(
        qdigest_sketch(empty_longs, "x", k=16, universe_bits=8),
        k=16, universe_bits=8,
    )
    assert r.n_total == 0

    # overlap: one side empty → overlap 0, union = other side
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    row = distinct_overlap(a, a.where(F.lit(False)), "k").collect()[0]
    assert row["n_b"] == 0 and row["n_overlap"] == 0

    # pagerank: empty edges → empty ranks
    assert pagerank(
        spark.createDataFrame([], "src string, dst string")
    ).count() == 0


def test_image_dedup_composition_end_to_end(spark):
    """Cross-family composition: dHash → banded near-dup pairs →
    connected-component clustering (dedup/cluster) → canonical keep —
    the image analogue of the text curation pipeline, over planted
    duplicate groups."""
    from etl_data_lake_spark.dedup.cluster import connected_components
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.multimodal.phash import image_near_dup_pairs
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    # plant: doc_ids 0/96/192 share dims (mod 32 and 24) AND text →
    # identical rasters; all ≡ 0 mod 3 → images
    dup_text = "the planted duplicate body " * 4
    planted = spark.createDataFrame(
        [(0, dup_text), (96, dup_text), (192, dup_text)],
        "doc_id long, text string",
    )
    base = docs.where(~F.col("doc_id").isin(0, 96, 192)).select(
        "doc_id", "text"
    )
    media = fake_media_table(base.unionByName(planted))
    pairs = image_near_dup_pairs(media, max_distance=1, bands=4)
    comp = connected_components(pairs, a_col="id_a", b_col="id_b")
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    planted_cluster = [c for c in clusters.values() if 0 in c]
    assert planted_cluster and planted_cluster[0] >= {0, 96, 192}
    # canonical keep: min id per cluster survives
    keep = comp.groupBy("cluster_id").agg(
        F.min("doc_id").alias("canonical")
    )
    survivors = {r["canonical"] for r in keep.collect()}
    assert 0 in survivors and 96 not in survivors and 192 not in survivors


def test_round11_ops_on_empty(spark, empty_docs):
    """Round-11 operators on empty inputs: empty results (or the
    documented loud raise), never a crash or a silent wrong shape."""
    from datetime import datetime

    from etl_data_lake_spark.dedup.substring import (
        dedup_repeated_substrings,
        maximal_match_spans,
    )
    from etl_data_lake_spark.functions.repetition import (
        compression_filter,
        compression_signals,
    )
    from etl_data_lake_spark.operators.dsir import (
        dsir_log_weights,
        dsir_resample,
        hashed_ngram_buckets,
    )
    from etl_data_lake_spark.operators.embedding_drift import (
        embedding_cell_histogram,
    )
    from etl_data_lake_spark.operators.joins import interval_join_stream
    from etl_data_lake_spark.sources.catalog import load_table

    # maximal matches / the dedup action: empty in, empty (or
    # unchanged-empty) out
    assert maximal_match_spans(empty_docs).count() == 0
    assert dedup_repeated_substrings(empty_docs).count() == 0

    # compression signals: empty frame → empty frame, schema intact
    sig = compression_signals(empty_docs)
    assert sig.count() == 0
    assert set(sig.columns) == {
        "doc_id", "raw_bytes", "compressed_bytes", "compression_ratio",
    }
    assert compression_filter(empty_docs).count() == 0

    # DSIR: empty pool featurizes to nothing; an empty SIDE for the
    # distribution fit raises loudly (fitting on nothing is a config
    # error, profile.drift_report's rule)
    assert hashed_ngram_buckets(empty_docs).count() == 0
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    with pytest.raises(ValueError, match="non-empty"):
        dsir_log_weights(empty_docs, docs)
    with pytest.raises(ValueError, match="non-empty"):
        dsir_log_weights(docs, empty_docs)
    w = dsir_log_weights(docs, docs)
    assert dsir_resample(w.where(F.lit(False)), k=3).count() == 0

    # stream-stream interval join on empty (batch) frames
    p = spark.createDataFrame(
        [], "point_id long, key long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(1, 100, datetime(2024, 1, 1), datetime(2024, 1, 2))],
        "iv_id long, key long, s timestamp, e timestamp",
    )
    assert interval_join_stream(
        p, iv, point_ts="ts", start_col="s", end_col="e", on=("key",)
    ).count() == 0
    assert interval_join_stream(
        spark.createDataFrame(
            [(1, 100, datetime(2024, 1, 1, 6))],
            "point_id long, key long, ts timestamp",
        ),
        iv.where(F.lit(False)),
        point_ts="ts", start_col="s", end_col="e", on=("key",),
    ).count() == 0

    # embedding drift: an empty side histograms to zero rows, and the
    # PSI core then raises its empty-side guard downstream
    emb = load_table(spark, SF_DIR, "embeddings")
    from etl_data_lake_spark.similarity.kmeans import kmeans_fit

    cells, _ = kmeans_fit(emb.limit(50), 4, "vec_id", "embedding")
    assert embedding_cell_histogram(
        emb.where(F.lit(False)), cells
    ).count() == 0


def test_afp_on_empty(spark, empty_docs):
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.multimodal.afp import audio_near_dup_pairs

    media = fake_media_table(empty_docs).select(
        "media_id", "kind", "payload"
    )
    assert audio_near_dup_pairs(media).count() == 0
