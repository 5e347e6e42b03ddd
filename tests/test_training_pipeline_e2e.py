"""End-to-end training-data pipeline: every LLM-curation operator
family composing on the real documents table, stage by stage —

  profile → normalize (unicode/markup) → per-source boilerplate
  strip → reference-LM perplexity filter → MODEL-BASED quality
  filter (Naive-Bayes trained on the heuristic's weak labels —
  integer-scored, so the verdict is layout-stable) + cheap length
  gate → near-dup removal (MinHash-LSH + connected components) →
  per-domain cap → quality-weighted sampling → mixture resample →
  train/val/test split → chunk → EXACT-BPE token counting →
  sequence packing → shuffled-shard export

with invariants asserted at every hand-off (monotone shrinkage, no
duplication, exact split partitioning, export round-trip) and the
whole composition proven DETERMINISTIC end-to-end: a second run from
a repartitioned source produces the identical final corpus."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)
from etl_data_lake_spark.dedup.cluster import dedup_keep_canonical
from etl_data_lake_spark.dedup.minhash import minhash_lsh_pairs
from etl_data_lake_spark.functions.bpe import bpe_token_counts, learn_bpe
from etl_data_lake_spark.functions.classifier import nb_quality_filter
from etl_data_lake_spark.functions.normalize import normalize_docs
from etl_data_lake_spark.functions.lm import (
    perplexity_filter,
    train_unigram_lm,
)
from etl_data_lake_spark.operators.chunking import chunk_documents
from etl_data_lake_spark.operators.export import write_shuffled_shards
from etl_data_lake_spark.operators.packing import pack_sequences
from etl_data_lake_spark.operators.profile import profile
from etl_data_lake_spark.operators.sampling import (
    cap_per_stratum,
    resample_to_mixture,
    split_deterministic,
    weighted_sample,
)
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def _run_pipeline(spark, docs):
    # 1b. unicode/markup normalization, then per-source chrome strip
    # (both rewrite text in place — row sets are unchanged, so every
    # downstream subset invariant sees them transparently)
    docs = normalize_docs(docs)
    bp = boilerplate_lines(
        docs, group_col="source", min_docs=3, min_frac=0.25
    )
    docs = strip_boilerplate(docs, bp, group_col="source")
    # 2. reference LM from the English slice; drop gibberish-like docs
    ref = docs.where(F.col("lang") == "en")
    model, oov = train_unigram_lm(ref, vocab_size=5_000, alpha=0.5)
    fluent = perplexity_filter(docs, model, oov, max_perplexity=8_000)
    # 3. model-based quality gate (NB on weak labels; layout-stable
    # integer scoring) composed with the cheap length gate
    quality = nb_quality_filter(fluent).where(F.length("text") >= 50)
    # 4. near-dup removal
    pairs = minhash_lsh_pairs(quality, threshold=0.5)
    unique = dedup_keep_canonical(quality, pairs)
    pairs.sparkSession.catalog.clearCache()  # shingle-table persist
    # 5. per-domain cap, then length-weighted selection (quality
    # scores would slot in the same way), then mixture + 6. split
    capped = cap_per_stratum(unique, 40, "source", ("doc_id",))
    weighted = weighted_sample(
        capped.withColumn("_w", F.length("text").cast("double")),
        35,
        "_w",
        ("doc_id",),
        stratum_col="source",
    ).drop("_w")
    mixed = resample_to_mixture(
        weighted,
        {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2},
        "source",
        ("doc_id",),
    )
    splits = split_deterministic(
        mixed, {"train": 0.8, "val": 0.1, "test": 0.1}, ("doc_id",)
    )
    return fluent, quality, unique, weighted, mixed, splits


def test_full_training_pipeline(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. profile the raw corpus
    prof = {r["column"]: r for r in profile(docs).collect()}
    assert prof["doc_id"]["n_rows"] == n0
    assert prof["text"]["n_nulls"] == 0

    fluent, quality, unique, weighted, mixed, splits = _run_pipeline(
        spark, docs
    )

    # monotone shrinkage, each stage a subset of the previous
    ids = list(map(_ids, (docs, fluent, quality, unique, weighted, mixed)))
    for a, b in zip(ids, ids[1:]):
        assert set(b) <= set(a)
        assert len(b) == len(set(b))  # no stage ever duplicates
    assert len(ids[-1]) > 0  # something survives

    # split partitions the mixed corpus exactly
    got = sorted(i for s in splits.values() for i in _ids(s))
    assert got == ids[-1]

    # 7. chunk long documents, then pack chunks to a token budget
    chunks = chunk_documents(splits["train"], 1_000, overlap=50).select(
        F.concat_ws(":", "doc_id", "chunk_idx").alias("doc_id"),
        "text",
    )
    assert chunks.count() >= splits["train"].count()
    assert (
        chunks.where(F.length("text") > 1_000).count() == 0
    )  # hard bound
    # token budgets from the EXACT BPE encode (functions/bpe), not a
    # length proxy: the packing bound below is a true token bound
    merges = learn_bpe(chunks, n_merges=50)
    train = bpe_token_counts(chunks, merges, out_col="n_tokens")
    train = train.withColumn(
        "n_tokens", F.greatest("n_tokens", F.lit(1))
    )
    packed = pack_sequences(train, "n_tokens", budget=2_000)
    assert packed.count() == chunks.count()
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .where((F.col("t") > 2_000) & (F.col("n") > 1))
    )
    assert over.count() == 0  # only oversize solos may exceed

    # 8. export as shuffled shards; round-trip exactly
    out = str(tmp_path / "shards")
    write_shuffled_shards(
        splits["train"].select("doc_id", "text"), out, 4, ("doc_id",)
    )
    files = sorted(glob.glob(f"{out}/shard=*/*.parquet"))
    exported = sorted(
        i
        for f in files
        for i in pq.read_table(f).column("doc_id").to_pylist()
    )
    assert exported == _ids(splits["train"])


def test_pipeline_is_deterministic_under_layout(spark):
    docs = load_table(spark, SF_DIR, "documents")
    *_, mixed1, _ = _run_pipeline(spark, docs)
    final1 = _ids(mixed1)
    *_, mixed2, _ = _run_pipeline(spark, docs.repartition(13))
    assert _ids(mixed2) == final1


def test_round9_stages_compose(spark, tmp_path):
    """The round-9 additions composing end-to-end on the real corpus:
    NB quality scores → isotonic calibration of the probabilities →
    calibrated-threshold gate → leakage-safe train/test split (near-
    dup clusters co-assign) → canonical-by-quality dedup of the train
    side → unigram token budgets → packing → curriculum export with a
    manifest that matches what was written."""
    from etl_data_lake_spark.functions.calibration import (
        fit_isotonic,
        isotonic_calibrate,
    )
    from etl_data_lake_spark.functions.classifier import (
        nb_quality_scores,
        weak_quality_label,
    )
    from etl_data_lake_spark.functions.text import tokens
    from etl_data_lake_spark.functions.unigram import (
        learn_unigram,
        unigram_token_counts,
    )
    from etl_data_lake_spark.operators.export import (
        read_export_manifest,
        write_curriculum_shards,
    )
    from etl_data_lake_spark.operators.sampling import split_leakage_safe

    docs = load_table(spark, SF_DIR, "documents")

    # 1. model scores → calibrated probabilities → threshold gate
    scored = docs.join(
        nb_quality_scores(docs).select("doc_id", "log_odds"), "doc_id"
    ).withColumn(
        "prob",
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("log_odds") )),
    ).withColumn(
        "y", weak_quality_label(tokens("text")).cast("long")
    ).persist()
    iso = fit_isotonic(scored, bins=100)
    calibrated = isotonic_calibrate(scored, iso)
    kept = calibrated.where(F.col("prob_calibrated") >= 0.5)
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()

    # 2. leakage-safe split: near-dup clusters co-assign
    pairs = minhash_lsh_pairs(
        kept.select("doc_id", "text"), threshold=0.5
    ).persist()
    splits = split_leakage_safe(
        kept, pairs, {"train": 0.8, "test": 0.2}
    )
    side = {}
    for name, frame in splits.items():
        for r in frame.select("doc_id").collect():
            side[r.doc_id] = name
    assert len(side) == n_kept
    for p in pairs.collect():
        assert side.get(p.doc_a) == side.get(p.doc_b), (p.doc_a, p.doc_b)

    # 3. canonical-by-quality dedup of the train side: the survivor
    # of every cluster is its best-scoring member
    train = splits["train"]
    train_pairs = pairs.join(
        train.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    )
    scores = train.select("doc_id", F.col("log_odds").alias("score"))
    unique = dedup_keep_canonical(train, train_pairs, scores=scores)
    assert unique.count() <= train.count()

    # 4. unigram token budgets → packing bound holds for TRUE counts
    model = learn_unigram(unique, vocab_size=200, em_iters=1)
    budgeted = unigram_token_counts(unique, model, out_col="n_tokens")
    budgeted = budgeted.withColumn(
        "n_tokens", F.greatest("n_tokens", F.lit(1))
    )
    packed = pack_sequences(
        budgeted.select("doc_id", "n_tokens"), "n_tokens", budget=3_000
    )
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .where((F.col("t") > 3_000) & (F.col("n") > 1))
    )
    assert over.count() == 0

    # 5. curriculum export ordered by calibrated quality, manifest on
    out = str(tmp_path / "curr")
    write_curriculum_shards(
        unique.select("doc_id", "prob_calibrated"),
        out,
        3,
        "prob_calibrated",
        ("doc_id",),
        ascending=False,   # best-first curriculum
        manifest=True,
    )
    m = read_export_manifest(out)
    assert m["kind"] == "curriculum"
    assert m["total_rows"] == unique.count()
    # shard 0's scores all >= shard 2's (descending curriculum)
    lo0 = min(
        pq.read_table(f).column("prob_calibrated").to_pylist()[-1]
        for f in glob.glob(f"{out}/shard=0/*.parquet")
    )
    hi2 = max(
        v
        for f in glob.glob(f"{out}/shard=2/*.parquet")
        for v in pq.read_table(f).column("prob_calibrated").to_pylist()
    )
    assert lo0 >= hi2
    scored.unpersist()
    pairs.unpersist()


def test_round10_s2_stages_compose(spark, tmp_path):
    """The session-2 additions composing end-to-end on the real
    corpus: KN-bigram perplexity gate (trained on the high-quality
    half, persisted and RELOADED before scoring — the artifact path
    is the production path) → q-digest equal-frequency curriculum
    banding on document length → PSI drift monitor between the raw
    corpus and the curated result (curation SHOULD shift the
    distribution it gates on; the null direction — curated vs curated
    — must read 0) → image near-dup audit over the same corpus's
    media twin."""
    from etl_data_lake_spark.dedup.cluster import connected_components
    from etl_data_lake_spark.functions.lm import (
        kn_bigram_perplexity_score,
        train_kn_bigram_lm,
    )
    from etl_data_lake_spark.functions.lm_io import load_lm, save_kn_lm
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.multimodal.phash import image_near_dup_pairs
    from etl_data_lake_spark.operators.profile import (
        drift_report,
        population_stability_index,
    )
    from etl_data_lake_spark.operators.sketches import quantile_buckets

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()

    # 1. KN gate: train on the longest half (proxy reference), persist,
    # reload, score everything, keep the in-domain half
    median_len = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
    ref = docs.where(F.col("n_chars") >= median_len)
    model = train_kn_bigram_lm(ref, vocab_size=5000, max_bigrams=50_000)
    path = str(tmp_path / "kn.json")
    save_kn_lm(path, model)
    _, loaded = load_lm(spark, path)
    scores = kn_bigram_perplexity_score(docs, loaded)
    cut = scores.approxQuantile("perplexity", [0.7], 0.0)[0]
    keep_ids = scores.where(F.col("perplexity") <= cut).select("doc_id")
    curated = docs.join(keep_ids, "doc_id", "left_semi")
    n_curated = curated.count()
    assert 0 < n_curated < n_docs

    # 2. curriculum banding by length — equal-frequency, no sort
    banded = quantile_buckets(
        curated, "n_chars", 4, out_col="band", universe_bits=20
    )
    bands = {
        r["band"]: r["n"]
        for r in banded.groupBy("band").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(bands) == {0, 1, 2, 3}
    assert max(bands.values()) <= 2 * min(bands.values())

    # 3. drift monitor: curation gated on perplexity (correlated with
    # length), so the length distribution must shift vs raw…
    shifted = population_stability_index(
        drift_report(docs, curated, "n_chars", bins=12, lo=0.0, hi=3000.0)
    )
    assert shifted > 0
    # …and the null direction reads zero
    null_psi = population_stability_index(
        drift_report(curated, curated, "n_chars", bins=12, lo=0.0, hi=3000.0)
    )
    assert abs(null_psi) < 1e-12

    # 4. multimodal audit: the curated corpus's media twin has no
    # unexpected near-identical images beyond the planted none
    media = fake_media_table(curated.limit(120))
    pairs = image_near_dup_pairs(media, max_distance=0, bands=4)
    comp_input = pairs
    assert comp_input.count() == pairs.count()  # plan sanity
    if pairs.count() > 0:
        comp = connected_components(pairs, a_col="id_a", b_col="id_b")
        assert comp.count() >= 2  # any pair implies a >=2-node cluster


def test_round11_stages_compose(spark, tmp_path):
    """The round-11 additions composing end-to-end on the real corpus
    (plus planted duplicates so the substring action has work to do):
    compression-ratio gate → keep-first maximal-substring dedup →
    DSIR selection toward the English slice → KN-trigram gate whose
    model travels through the ARPA INTEROP path (save_arpa →
    load_arpa → in-plan backoff scoring) → embedding-space drift
    monitor over frozen k-means cells (selection must shift the
    embedding distribution; the null direction must read 0)."""
    from etl_data_lake_spark.dedup.substring import (
        dedup_repeated_substrings,
        maximal_match_spans,
    )
    from etl_data_lake_spark.functions.lm import train_kn_trigram_lm
    from etl_data_lake_spark.functions.lm_io import (
        arpa_perplexity_score,
        load_arpa,
        save_arpa,
    )
    from etl_data_lake_spark.functions.repetition import compression_filter
    from etl_data_lake_spark.operators.dsir import (
        dsir_log_weights,
        dsir_resample,
    )
    from etl_data_lake_spark.operators.embedding_drift import (
        embedding_cell_histogram,
    )
    from etl_data_lake_spark.operators.profile import (
        drift_report_from_histograms,
        population_stability_index,
    )
    from etl_data_lake_spark.similarity.kmeans import kmeans_fit

    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # plant verbatim cross-doc passages: append doc 0's first 12
    # tokens onto docs 3 and 7 so the dedup action has real cuts
    head12 = " ".join(
        docs.where(F.col("doc_id") == 0).collect()[0]["text"].split()[:12]
    )
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(3, 7),
            F.concat_ws(" ", "text", F.lit(head12)),
        ).otherwise(F.col("text")),
    )

    # 1. compression gate (wide band: the synthetic corpus is prose-y)
    gated = compression_filter(planted, min_ratio=0.05, max_ratio=0.98)
    n1 = gated.count()
    assert 0 < n1 <= n0

    # 2. keep-first substring dedup: the planted copies lose their
    # passage, doc 0 keeps it
    deduped = dedup_repeated_substrings(gated, w=8, min_length=10)
    texts = {
        r["doc_id"]: r["text"]
        for r in deduped.where(F.col("doc_id").isin(0, 3, 7)).collect()
    }
    assert head12 in texts[0]
    assert head12 not in texts[3] and head12 not in texts[7]
    assert maximal_match_spans(deduped, w=8).where(
        F.col("match_tokens") >= 10
    ).count() == 0
    assert deduped.count() == n1  # action rewrites text, drops no rows

    # 3. DSIR toward the English slice: selected docs skew English
    target = deduped.where(F.col("lang") == "en")
    pool = deduped.where(F.col("lang").isNotNull())
    w = dsir_log_weights(pool, target, buckets=2048)
    picked = dsir_resample(w, k=120, seed=1).select("doc_id")
    sel = deduped.join(picked, "doc_id", "left_semi")
    base_rate = target.count() / pool.count()
    sel_rate = sel.where(F.col("lang") == "en").count() / sel.count()
    assert sel_rate > base_rate

    # 4. KN-trigram gate through the ARPA interop path
    m3 = train_kn_trigram_lm(
        sel, vocab_size=5_000, max_trigrams=50_000, max_bigrams=50_000
    )
    apath = str(tmp_path / "model.arpa")
    save_arpa(apath, m3)
    arpa = load_arpa(apath)
    ppl = arpa_perplexity_score(deduped, arpa)
    # null perplexity is the token-less-doc contract, nothing else
    assert (
        ppl.where(F.col("perplexity").isNull())
        .where(F.col("n_tokens") > 0)
        .count()
        == 0
    )
    cut = ppl.approxQuantile("perplexity", [0.8], 0.0)[0]
    fluent = deduped.join(
        ppl.where(F.col("perplexity") <= cut).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    assert 0 < fluent.count() < n1

    # 5. embedding drift: fit cells on the RAW corpus's vectors, then
    # compare raw vs the selected slice's vectors
    emb = load_table(spark, SF_DIR, "embeddings")
    cells, _ = kmeans_fit(emb, 8, "vec_id", "embedding")
    h_raw = embedding_cell_histogram(emb, cells)
    sel_emb = emb.join(
        sel.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    psi = population_stability_index(
        drift_report_from_histograms(
            h_raw, embedding_cell_histogram(sel_emb, cells)
        )
    )
    assert psi > 0.0
    assert population_stability_index(
        drift_report_from_histograms(h_raw, h_raw)
    ) == 0.0


def test_round12_stages_compose(spark):
    """The round-12 additions composing end-to-end: the web-corpus
    FRONT DOOR every public CC pipeline opens with — URL/domain stage
    (host → eTLD+1 → stats → blocklist) → Gopher rule gate → C4 page
    cleanup — then the multimodal side's audio near-dup over the same
    corpus. Thresholds are corpus-adapted where the synthetic corpus
    lacks the signal (no punctuation, one stop word); the PAPER
    defaults are pinned per-rule in test_gopher/test_c4."""
    from etl_data_lake_spark.functions.c4 import c4_clean
    from etl_data_lake_spark.functions.gopher import (
        gopher_filter,
        gopher_signals,
    )
    from etl_data_lake_spark.functions.urls import (
        domain_stats,
        filter_domains,
        with_domain,
    )
    from etl_data_lake_spark.multimodal.afp import audio_near_dup_pairs
    from etl_data_lake_spark.multimodal.codec import fake_media_table
    from etl_data_lake_spark.queries.curation_ops import doc_urls

    docs = doc_urls(load_table(spark, SF_DIR, "documents"))
    n0 = docs.count()

    # 1. domain stats: shares sum to 1, doc masses add up
    stats = domain_stats(docs, url_col="url").collect()
    assert sum(r.n_docs for r in stats) == n0
    assert abs(sum(r.doc_share for r in stats) - 1.0) < 1e-3

    # 2. blocklist the single largest domain; the kept set must be
    # EXACTLY the complement of its documents
    worst = max(stats, key=lambda r: (r.n_docs, r.domain)).domain
    kept = filter_domains(docs, url_col="url", blocklist=[worst])
    doms = with_domain(docs, url_col="url")
    want_kept = doms.where(F.col("domain") != worst).count()
    n1 = kept.count()
    assert n1 == want_kept < n0

    # 3. Gopher gate (corpus-adapted: synthetic docs carry ~1 stop
    # word and 30-70 words) — kept rows must individually satisfy the
    # same signals the audit projection reports
    gated = gopher_filter(kept, min_words=20, min_stop_hits=1)
    n2 = gated.count()
    assert 0 < n2 <= n1
    sig = gopher_signals(gated)
    assert sig.where(
        (F.col("n_words") < 20) | (F.col("n_stop_hits") < 1)
    ).count() == 0

    # 4. C4 page cleanup: punctuate the tail (the synthetic corpus has
    # no sentence structure), plant one code page — it must drop
    punct = gated.withColumn("text", F.concat_ws("", "text", F.lit(".")))
    code_page = punct.limit(1).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    ).withColumn("text", F.concat_ws("", "text", F.lit(" { }")))
    cleaned = c4_clean(punct.union(code_page), min_sentences=1)
    assert cleaned.count() == n2  # the planted code page dropped
    assert cleaned.where(~F.col("text").rlike(r"\.$")).count() == 0

    # 5. audio near-dup on the corpus's media table with one planted
    # duplicate clip: the pair surfaces at Hamming 0
    media = fake_media_table(
        load_table(spark, SF_DIR, "documents").limit(150)
    )
    one = media.where(F.col("kind") == "audio").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(one.media_id + 5_000_000, one.kind, bytearray(one.payload))],
        "media_id long, kind string, payload binary",
    )
    pairs = audio_near_dup_pairs(
        media.select("media_id", "kind", "payload").union(dup),
        max_distance=1, bands=2,
    )
    hit = pairs.where(
        (F.col("id_a") == one.media_id)
        & (F.col("id_b") == one.media_id + 5_000_000)
    ).collect()
    assert len(hit) == 1 and hit[0].hamming == 0


def test_round13_stages_compose(spark):
    """The round-13 additions composing end-to-end on the real corpus:
    PSL-exact domain grouping → per-domain quota (cap_per_domain) →
    corpus-wide paragraph dedup → LM scoring → CCNet head/middle/tail
    bucketing — the full web-pipeline spine with this round's
    operators in their production positions."""
    from etl_data_lake_spark.dedup.paragraphs import (
        drop_duplicate_paragraphs,
        duplicate_paragraph_stats,
    )
    from etl_data_lake_spark.functions.lm import (
        perplexity_buckets,
        perplexity_score,
        train_unigram_lm,
    )
    from etl_data_lake_spark.functions.urls import (
        cap_per_domain,
        parse_psl,
        with_domain_psl,
    )
    from etl_data_lake_spark.queries.curation_ops import doc_urls

    docs = doc_urls(load_table(spark, SF_DIR, "documents"))
    n0 = docs.count()

    # 1. PSL-exact quota: cap every registered domain at 10 docs,
    # preferring longer documents (a quality proxy), id tiebreak
    psl = parse_psl(
        ["com", "org", "io", "uk", "co.uk", "au", "com.au"]
    )
    capped = cap_per_domain(
        docs,
        [F.desc("n_chars"), F.asc("doc_id")],
        max_docs=10,
        psl=psl,
    )
    n1 = capped.count()
    assert 0 < n1 < n0
    doms = with_domain_psl(capped, psl)
    per_dom = doms.groupBy("domain").count().collect()
    assert max(r["count"] for r in per_dom) <= 10
    # and within a domain the kept docs are the LONGEST ones: the
    # shortest kept >= the longest dropped for a full domain
    full = [r.domain for r in per_dom if r["count"] == 10]
    if full:
        d = full[0]
        kept_min = (
            doms.where(F.col("domain") == d)
            .agg(F.min("n_chars")).collect()[0][0]
        )
        dropped_max = (
            with_domain_psl(docs, psl)
            .where(F.col("domain") == d)
            .join(capped.select("doc_id"), "doc_id", "left_anti")
            .agg(F.max("n_chars")).collect()[0][0]
        )
        assert dropped_max is None or kept_min >= dropped_max

    # 2. plant a boilerplate paragraph on a slice, paragraph-dedup it
    footer = "Subscribe to our newsletter for updates."
    with_footer = capped.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat_ws("\n\n", "text", F.lit(footer)),
        ).otherwise(F.col("text")),
    )
    stats = duplicate_paragraph_stats(with_footer).where(
        F.col("n_occurrences") >= 2
    )
    footer_row = [
        r for r in stats.collect()
        if r.n_occurrences >= n1 // 5 - 1
    ]
    assert footer_row, "planted footer not found in dup stats"
    deduped = drop_duplicate_paragraphs(with_footer)
    # exactly one copy of the footer survives corpus-wide
    n_with = deduped.where(
        F.col("text").contains(footer)
    ).count()
    assert n_with == 1
    assert deduped.count() == n1  # no row lost

    # 3. LM-score the deduped corpus and bucket per language
    model, oov = train_unigram_lm(
        deduped.select("doc_id", "text"), vocab_size=2000
    )
    scored = perplexity_score(deduped.select("doc_id", "text"), model, oov)
    scored = scored.join(
        deduped.select("doc_id", "lang"), "doc_id"
    )
    bucketed = perplexity_buckets(scored, exact=True)
    counts = {
        (r.lang, r.ppl_bucket): r["count"]
        for r in bucketed.groupBy("lang", "ppl_bucket").count().collect()
    }
    langs = {k[0] for k in counts}
    for lang in langs:
        tot = sum(v for (l, _), v in counts.items() if l == lang)
        if tot >= 9:
            # terciles: each bucket holds roughly a third per language
            for b in ("head", "middle", "tail"):
                assert counts.get((lang, b), 0) >= tot // 6, (lang, b)
