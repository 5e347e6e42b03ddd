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


# ------------------------------------------------------- bigram model


def test_bigram_hand_computed(spark):
    from etl_data_lake_spark.functions.lm import (
        bigram_perplexity_score,
        train_bigram_lm,
    )

    # reference: "a b a b" + "a c" -> bigrams: ab, ba, ab, ac
    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    uni, oov, bi = train_bigram_lm(ref, vocab_size=10, alpha=1.0)
    pml = {(r["w1"], r["w2"]): r["p_ml"] for r in bi.collect()}
    # c(a,.)=3: ab twice, ac once; c(b,.)=1: ba once
    assert pml[("a", "b")] == pytest.approx(2 / 3)
    assert pml[("a", "c")] == pytest.approx(1 / 3)
    assert pml[("b", "a")] == pytest.approx(1.0)
    # score "a b" under lam=0.5:
    # N=6 tokens (a:3, b:2, c:1), V=3, denom=6+4=10
    # p_uni(a)=4/10, p_uni(b)=3/10; first token: log(0.4)
    # second: log(0.5*2/3 + 0.5*0.3)
    docs = spark.createDataFrame([(7, "a b")], "doc_id long, text string")
    row = bigram_perplexity_score(docs, uni, oov, bi, lam=0.5).collect()[0]
    want_lp = (math.log(4 / 10) + math.log(0.5 * 2 / 3 + 0.5 * 3 / 10)) / 2
    assert row["n_tokens"] == 2
    assert row["avg_neg_logp"] == pytest.approx(-want_lp, rel=1e-12)
    # unseen bigram ("b","c") falls back to the unigram floor only
    docs2 = spark.createDataFrame([(8, "b c")], "doc_id long, text string")
    row2 = bigram_perplexity_score(docs2, uni, oov, bi, lam=0.5).collect()[0]
    want2 = (math.log(3 / 10) + math.log(0.5 * 0.0 + 0.5 * 2 / 10)) / 2
    assert row2["avg_neg_logp"] == pytest.approx(-want2, rel=1e-12)


def test_bigram_lam_zero_equals_unigram(spark):
    from etl_data_lake_spark.functions.lm import (
        bigram_perplexity_score,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the dog sleeps by the quick river")],
        "doc_id long, text string",
    )
    uni, oov, bi = train_bigram_lm(ref, vocab_size=100)
    docs = spark.createDataFrame(
        [(1, "the quick dog"), (2, "unseen words entirely"), (3, "")],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: r["perplexity"]
        for r in bigram_perplexity_score(docs, uni, oov, bi, lam=0.0).collect()
    }
    b = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity_score(docs, uni, oov).collect()
    }
    assert a[1] == pytest.approx(b[1], rel=1e-12)
    assert a[2] == pytest.approx(b[2], rel=1e-12)
    assert a[3] is None and b[3] is None


def test_bigram_context_separates_word_salad(spark):
    from etl_data_lake_spark.functions.lm import (
        bigram_perplexity_score,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug")
         for i in range(4)],
        "doc_id long, text string",
    )
    uni, oov, bi = train_bigram_lm(ref, vocab_size=100)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),      # fluent, in-domain order
         (2, "mat the on cat the sat")],     # same unigrams, shuffled
        "doc_id long, text string",
    )
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in bigram_perplexity_score(docs, uni, oov, bi, lam=0.7).collect()
    }
    # a unigram model cannot tell these apart; the bigram model must
    assert ppl[1] < ppl[2] / 2
    uppl = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity_score(docs, uni, oov).collect()
    }
    assert uppl[1] == pytest.approx(uppl[2], rel=1e-9)


def test_bigram_truncation_and_layout_invariance(spark):
    from etl_data_lake_spark.functions.lm import (
        bigram_perplexity_score,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon w{i} alpha beta")
         for i in range(6)],
        "doc_id long, text string",
    )
    uni, oov, bi_all = train_bigram_lm(ref, vocab_size=100)
    uni2, oov2, bi_cut = train_bigram_lm(ref, vocab_size=100, max_bigrams=3)
    assert bi_cut.count() == 3 and bi_all.count() > 3
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    full = bigram_perplexity_score(docs, uni, oov, bi_all).collect()[0]
    cut = bigram_perplexity_score(docs, uni2, oov2, bi_cut).collect()[0]
    # truncation only removes bigram mass -> never lowers perplexity
    assert cut["perplexity"] >= full["perplexity"]
    # layout invariance of training
    uni3, oov3, bi3 = train_bigram_lm(ref.repartition(5), vocab_size=100)
    got = {(r["w1"], r["w2"]): r["p_ml"] for r in bi3.collect()}
    want = {(r["w1"], r["w2"]): r["p_ml"] for r in bi_all.collect()}
    assert got == want
    with pytest.raises(ValueError, match="lam"):
        bigram_perplexity_score(docs, uni, oov, bi_all, lam=1.0)


# ---------------------------------------------------------------------------
# Round 13: CCNet head/middle/tail perplexity bucketing
# ---------------------------------------------------------------------------


def _scored_fixture(spark):
    # two languages, perplexities 1..9 (en) and 10,20,30 (de), plus a
    # null-perplexity row (empty doc)
    rows = [(i, "en", float(i)) for i in range(1, 10)]
    rows += [(100, "de", 10.0), (101, "de", 20.0), (102, "de", 30.0)]
    rows += [(200, "en", None)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, perplexity double"
    )


def test_perplexity_cuts_exact_per_language(spark):
    from etl_data_lake_spark.functions.lm import perplexity_cuts

    cuts = {
        r.lang: (r.cut_1, r.cut_2)
        for r in perplexity_cuts(
            _scored_fixture(spark), exact=True
        ).collect()
    }
    # en: 9 values 1..9 → interpolated terciles at ranks 1+8/3, 1+16/3
    assert cuts["en"][0] == pytest.approx(1 + 8 / 3)
    assert cuts["en"][1] == pytest.approx(1 + 16 / 3)
    # de: 3 values → cuts between them
    assert cuts["de"][0] == pytest.approx(10 + 20 / 3)
    assert cuts["de"][1] == pytest.approx(10 + 40 / 3)


def test_perplexity_buckets_ccnet_semantics(spark):
    from etl_data_lake_spark.functions.lm import perplexity_buckets

    out = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(
            _scored_fixture(spark), exact=True
        ).collect()
    }
    # en: 1..3 head (≤3.667), 4,5 middle (≤6.333), 7..9 tail
    assert [out[i] for i in range(1, 10)] == [
        "head", "head", "head", "middle", "middle", "middle",
        "tail", "tail", "tail",
    ]
    # de buckets use DE's cuts, not EN's
    assert (out[100], out[101], out[102]) == ("head", "middle", "tail")
    # a null perplexity must NOT land in head
    assert out[200] is None


def test_perplexity_buckets_approx_matches_exact_small(spark):
    from etl_data_lake_spark.functions.lm import perplexity_buckets

    df = _scored_fixture(spark)
    a = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, exact=False).collect()
    }
    b = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, exact=True).collect()
    }
    # at 12 values the sketch's rank error is < 1 rank at
    # accuracy=10k, but the two estimators may still disagree on
    # EXACT-tie boundary docs; require agreement off the boundaries
    diff = {k for k in a if a[k] != b[k]}
    assert len(diff) <= 2, (diff, a, b)


def test_perplexity_buckets_frozen_cuts_and_guards(spark):
    from etl_data_lake_spark.functions.lm import (
        perplexity_buckets,
        perplexity_cuts,
    )

    df = _scored_fixture(spark)
    frozen = perplexity_cuts(df.where(F.col("lang") == "en"), exact=True)
    out = perplexity_buckets(df, cuts=frozen, exact=True)
    got = {r.doc_id: r.ppl_bucket for r in out.collect()}
    # de rows have no cuts in the frozen table → every non-null
    # comparison fails → they fall to the LAST label (tail), loudly
    # visible, never silently head
    assert got[100] == got[102] == "tail"
    with pytest.raises(ValueError, match="bounds"):
        perplexity_cuts(df, bounds=(0.9, 0.1))
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(df, labels=("a", "b"))
    with pytest.raises(ValueError, match="rename"):
        perplexity_buckets(df.withColumn("ppl_bucket", F.lit("x")))


def test_perplexity_buckets_corpus_side_never_shuffles(spark):
    from etl_data_lake_spark.functions.lm import (
        perplexity_buckets,
        perplexity_cuts,
    )

    df = _scored_fixture(spark)
    frozen = perplexity_cuts(df, exact=True)
    plan = (
        perplexity_buckets(df, cuts=frozen)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # any hash exchange belongs to the ≤|langs|-row cut aggregation
    # (keyed on lang); the corpus side reaches the join unshuffled
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "lang" in line, line


def test_perplexity_buckets_null_lang_group(spark):
    """Round-13 review fix: null-language rows form their own
    quantile group and must bucket against THAT group's cuts (the
    plain equi-join could never reach the null-group cut row, so
    every null-lang doc silently landed in 'tail')."""
    from etl_data_lake_spark.functions.lm import perplexity_buckets

    rows = [(i, None, float(i)) for i in range(1, 10)]
    rows += [(100, "en", 50.0), (101, "en", 60.0), (102, "en", 70.0)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, perplexity double"
    )
    out = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, exact=True).collect()
    }
    # the null group's own terciles: 1-3 head … 7-9 tail
    assert [out[i] for i in (1, 5, 9)] == ["head", "middle", "tail"]
    # and a fluent null-lang doc is NOT condemned by en's cuts
    assert out[1] == "head"
    assert (out[100], out[102]) == ("head", "tail")
