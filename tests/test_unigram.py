"""Unigram-LM tokenizer (functions/unigram): hand-checked EM outcome,
Viterbi optimality vs exhaustive segmentation, bit-equality of the
Spark path against the pure-Python reference over the real documents
fixture, and the packing composition — the test strategy mirrored
from tests/test_bpe.py per the round-8 verdict (#2)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.bpe import split_words, word_histogram
from etl_data_lake_spark.functions.unigram import (
    UnigramModel,
    learn_unigram,
    train_unigram_from_hist,
    unigram_encode,
    unigram_token_counts,
    unigram_tokens_df,
)
from tests.conftest import SF_DIR


def test_em_learns_the_dominant_pieces(spark):
    """Two repeated words over a diverse alphabet: EM concentrates
    essentially all mass on the two whole-word pieces (each ends at
    log 1/2) and Viterbi emits them as single tokens. (A single-letter
    corpus like 'aaaa' would NOT behave this way — the lone character
    keeps enough unigram mass that EM spreads over the lattice, the
    same characteristic real SentencePiece shows.)"""
    docs = spark.createDataFrame(
        [(i, "hello world") for i in range(20)],
        "doc_id long, text string",
    )
    model = learn_unigram(docs, vocab_size=16, max_piece_len=5)
    assert "hello" in model.logp and "world" in model.logp
    assert {p for p in model.logp if len(p) == 1} >= set("helowrd")
    assert unigram_encode("hello", model) == ["hello"]
    assert unigram_encode("world", model) == ["world"]
    # the two whole words split the corpus likelihood evenly
    assert math.isclose(model.logp["hello"], math.log(0.5), abs_tol=1e-9)
    assert math.isclose(model.logp["world"], math.log(0.5), abs_tol=1e-9)


def _score(pieces, model: UnigramModel) -> float:
    s = 0.0
    for p in pieces:
        lp = model.logp.get(p)
        if lp is None:
            if len(p) != 1:
                return float("-inf")
            lp = model.unk_logp
        s += lp
    return s


def _all_segmentations(word: str, L: int):
    if not word:
        yield []
        return
    for i in range(1, min(L, len(word)) + 1):
        head = word[:i]
        for rest in _all_segmentations(word[i:], L):
            yield [head] + rest


def test_viterbi_is_optimal(spark):
    """unigram_encode's score matches the exhaustive-best segmentation
    score for every word of the training corpus plus unseen words."""
    docs = spark.createDataFrame(
        [
            (0, "internationalization international nation"),
            (1, "nation national internation"),
            (2, "inter inter nation nation"),
        ],
        "doc_id long, text string",
    )
    model = learn_unigram(docs, vocab_size=24, max_piece_len=6)
    for w in [
        "internationalization", "national", "nation", "intern",
        "onion", "xyz",  # unseen chars exercise the unk fallback
    ]:
        got = unigram_encode(w, model)
        assert "".join(got) == w
        best = max(
            _score(s, model)
            for s in _all_segmentations(w, model.max_piece_len)
        )
        assert math.isclose(_score(got, model), best, rel_tol=0, abs_tol=1e-12)


def test_spark_learn_bit_equal_to_reference(spark):
    """learn_unigram over the REAL documents fixture == the pure-Python
    trainer over the locally-computed word histogram: identical piece
    sets and EXACT float log-prob equality (the distributed histogram
    is the only Spark-side step, and it is exact)."""
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    model = learn_unigram(docs, vocab_size=300, max_piece_len=6)
    local = Counter()
    for r in docs.select("text").collect():
        local.update(split_words(r["text"]))
    ref = train_unigram_from_hist(
        dict(local), vocab_size=300, max_piece_len=6
    )
    assert model.logp == ref.logp  # exact, not approx
    assert model.pieces == ref.pieces
    assert len(model.logp) <= 300
    # the distributed histogram itself is exact vs the local one
    assert word_histogram(docs) == dict(local)


def test_spark_counts_bit_equal_to_reference(spark):
    """unigram_token_counts over the documents fixture == summing the
    pure-Python encoder per word, doc by doc; the full-encoding
    surface agrees with the counts."""
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    model = learn_unigram(docs, vocab_size=300, max_piece_len=6)
    got = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in unigram_token_counts(docs, model).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = sum(
            len(unigram_encode(w, model)) for w in split_words(r["text"])
        )
        assert got[r["doc_id"]] == want
    enc = {
        r["doc_id"]: r["unigram_tokens"]
        for r in unigram_tokens_df(docs, model).collect()
    }
    assert all(len(enc[d]) == n for d, n in got.items())
    # subword compression actually happened (not a char splitter)
    n_words = sum(
        len(split_words(r["text"]))
        for r in docs.select("text").collect()
    )
    n_chars = sum(
        sum(len(w) for w in split_words(r["text"]))
        for r in docs.select("text").collect()
    )
    total = sum(got.values())
    assert n_words <= total < n_chars


def test_round_trip_and_coverage(spark):
    """Concatenating pieces recovers the word exactly — including
    words with characters the training corpus never saw; every corpus
    character is in the vocabulary (singles never pruned)."""
    docs = spark.createDataFrame(
        [(0, "tokenization internalization"), (1, "token internal")],
        "doc_id long, text string",
    )
    model = learn_unigram(docs, vocab_size=20, max_piece_len=5)
    corpus_chars = set("tokenizationinternalization")
    assert corpus_chars <= set(p for p in model.logp if len(p) == 1)
    for w in ["tokenization", "internalization", "unseen", "日本語"]:
        assert "".join(unigram_encode(w, model)) == w


def test_pruning_reaches_vocab_size_and_is_deterministic(spark):
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    m1 = learn_unigram(docs, vocab_size=150, max_piece_len=6)
    m2 = learn_unigram(docs, vocab_size=150, max_piece_len=6)
    assert m1.logp == m2.logp  # bit-deterministic across runs
    n_singles = sum(1 for p in m1.logp if len(p) == 1)
    assert len(m1.logp) <= max(150, n_singles)


def test_exact_counts_feed_packing(spark):
    """The composition the exact counts exist for: pack_sequences over
    n_unigram_tokens yields packs whose budgets hold for TRUE piece
    counts (same contract as the BPE twin)."""
    from etl_data_lake_spark.operators.packing import pack_sequences
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    model = learn_unigram(docs, vocab_size=300, max_piece_len=6)
    counted = unigram_token_counts(docs, model)
    budget = 600
    packed = pack_sequences(
        counted.select("doc_id", "n_unigram_tokens"),
        token_col="n_unigram_tokens",
        budget=budget,
    )
    per_pack = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_unigram_tokens").alias("t"))
        .collect()
    )
    assert per_pack and all(r["t"] <= budget for r in per_pack)
    assert packed.count() == docs.count()


def test_validation(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        learn_unigram(docs, vocab_size=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        learn_unigram(docs, vocab_size=5, max_piece_len=0)
    with pytest.raises(ValueError, match="shrink"):
        learn_unigram(docs, vocab_size=5, shrink=1.5)
    model = learn_unigram(docs, vocab_size=5)
    with pytest.raises(ValueError, match="already exists"):
        unigram_token_counts(
            docs.withColumn("n_unigram_tokens", F.lit(1)), model
        )
    # empty corpus → empty model, unk-only encoding still total
    empty = train_unigram_from_hist({}, vocab_size=5)
    assert empty.logp == {}
    assert "".join(unigram_encode("abc", empty)) == "abc"
