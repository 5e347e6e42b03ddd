"""Unigram LM perplexity filtering (functions/lm.py) — hand-computed
probabilities, OOV/truncation accounting, and the filter composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.lm import (
    perplexity_filter,
    perplexity_score,
    train_unigram_lm,
)


@pytest.fixture(scope="module")
def ref(spark):
    # reference corpus: tokens a a b  (N=3)
    return spark.createDataFrame(
        [(1, "a a"), (2, "b")], "doc_id long, text string"
    )


def test_hand_computed_unigram_probs(spark, ref):
    model, oov = train_unigram_lm(ref, vocab_size=10, alpha=1.0)
    got = {r["term"]: r["logp"] for r in model.collect()}
    # V=2 kept terms; denom = N + alpha*(V+1) = 3 + 3 = 6
    assert got["a"] == pytest.approx(math.log(3 / 6))
    assert got["b"] == pytest.approx(math.log(2 / 6))
    assert oov == pytest.approx(math.log(1 / 6))


def test_truncated_vocab_mass_goes_to_oov(spark, ref):
    model, oov = train_unigram_lm(ref, vocab_size=1, alpha=1.0)
    got = {r["term"]: r["logp"] for r in model.collect()}
    # only 'a' (count 2) survives; 'b' folds into OOV:
    # denom = 3 + 1*(1+1) = 5, p(a) = 3/5, p(oov) = (1+1)/5
    assert set(got) == {"a"}
    assert got["a"] == pytest.approx(math.log(3 / 5))
    assert oov == pytest.approx(math.log(2 / 5))


def test_perplexity_hand_computed(spark, ref):
    model, oov = train_unigram_lm(ref, vocab_size=10, alpha=1.0)
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, ""), (12, "a a a")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in perplexity_score(docs, model, oov).collect()
    }
    expect = -(math.log(3 / 6) + math.log(2 / 6) + math.log(1 / 6)) / 3
    assert rows[10]["n_tokens"] == 3
    assert rows[10]["avg_neg_logp"] == pytest.approx(expect)
    assert rows[10]["perplexity"] == pytest.approx(math.exp(expect))
    # blank doc: zero tokens, null perplexity (not a fake 1.0)
    assert rows[11]["n_tokens"] == 0
    assert rows[11]["perplexity"] is None
    # all in-vocab, most-likely term: the lowest possible perplexity
    assert rows[12]["perplexity"] == pytest.approx(6 / 3)
    assert rows[12]["perplexity"] < rows[10]["perplexity"]


def test_filter_keeps_in_domain(spark):
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "doc_id long, text string",
    )
    model, oov = train_unigram_lm(ref, vocab_size=100, alpha=0.1)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),          # in-domain
            (2, "zq xv qqj wpk zzz"),    # gibberish: all OOV
            (3, ""),                     # blank: no evidence, drops
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity_score(docs, model, oov).collect()
    }
    cut = (scores[1] + scores[2]) / 2
    kept = perplexity_filter(docs, model, oov, cut)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1]
    # the kept frame carries the ORIGINAL columns (semi-join)
    assert kept.columns == docs.columns


def test_train_validation_and_layout_invariance(spark, ref):
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_lm(ref, vocab_size=0)
    with pytest.raises(ValueError, match="alpha"):
        train_unigram_lm(ref, alpha=0.0)
    m1, o1 = train_unigram_lm(ref, vocab_size=10)
    m2, o2 = train_unigram_lm(ref.repartition(7), vocab_size=10)
    assert o1 == o2
    assert sorted(map(tuple, m1.collect())) == sorted(
        map(tuple, m2.collect())
    )
