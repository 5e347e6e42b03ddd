"""WordPiece tokenization (functions/wordpiece): hand-computed
training on a fixture where the likelihood score provably disagrees
with raw pair frequency (the property that distinguishes WordPiece
from BPE), the canonical greedy longest-match encode semantics
(BERT's un/##aff/##able example, UNK on any unmatchable remainder),
bit-equality of the Spark paths against the pure-Python reference
over the real documents fixture, and byte-stable persistence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.tokenizer_io import (
    load_tokenizer,
    save_wordpiece,
)
from etl_data_lake_spark.functions.wordpiece import (
    WordPieceModel,
    learn_wordpiece,
    train_wordpiece_from_hist,
    wordpiece_encode,
    wordpiece_token_counts,
    wordpiece_tokens_df,
)


def _model(pieces: list[str]) -> WordPieceModel:
    return WordPieceModel(vocab=("[UNK]", *pieces))


# ---------------------------------------------------------------- encode


def test_encode_bert_canonical_example():
    """The example from the BERT paper/readme: with a vocabulary
    containing un, ##aff, ##able (and not the whole word),
    'unaffable' → [un, ##aff, ##able]."""
    m = _model(["un", "##aff", "##able", "u", "##n", "##a"])
    assert wordpiece_encode("unaffable", m) == ["un", "##aff", "##able"]


def test_encode_is_longest_match_first():
    """Greedy maximal munch: 'hugs' takes 'hug' + '##s', never
    'hu' + '##gs', even though both segmentations exist."""
    m = _model(["hug", "hu", "##gs", "##g", "##s"])
    assert wordpiece_encode("hugs", m) == ["hug", "##s"]
    # and the FULL word wins over any split once present
    m2 = _model(["hugs", "hug", "##s"])
    assert wordpiece_encode("hugs", m2) == ["hugs"]


def test_encode_unk_semantics():
    """An unmatchable remainder makes the WHOLE word one UNK (BERT
    does not emit partial pieces + UNK), an over-length word is UNK
    by the guard, and the empty string encodes to nothing."""
    m = _model(["ab", "##c"])
    assert wordpiece_encode("abq", m) == ["[UNK]"]  # 'q' unmatchable
    assert wordpiece_encode("q", m) == ["[UNK]"]
    assert wordpiece_encode("", m) == []
    tiny = WordPieceModel(vocab=("[UNK]", "a", "##a"), max_input_chars=3)
    assert wordpiece_encode("aaaa", tiny) == ["[UNK]"]
    assert wordpiece_encode("aaa", tiny) == ["a", "##a", "##a"]


def test_encode_continuation_is_positional():
    """'##s' the suffix piece never matches at word start, and a bare
    piece never matches mid-word."""
    m = _model(["s", "##s"])
    assert wordpiece_encode("ss", m) == ["s", "##s"]
    m_no_cont = _model(["s"])
    assert wordpiece_encode("ss", m_no_cont) == ["[UNK]"]


# ----------------------------------------------------------------- train


def test_train_score_disagrees_with_frequency():
    """The WordPiece-vs-BPE discriminator, hand-computed. Histogram:
    'ab' x10, 'a' x90, 'b' x90, 'cd' x3.

    Pair counts: (a,##b)=10, (c,##d)=3 — BPE would merge (a,##b).
    Symbol counts: a=100, ##b=10, c=3, ##d=3.
    Scores: (a,##b) = 10/(100*10) = 0.01; (c,##d) = 3/(3*3) = 0.333.
    WordPiece merges (c,##d) FIRST."""
    hist = {"ab": 10, "a": 90, "b": 90, "cd": 3}
    m = train_wordpiece_from_hist(hist, vocab_size=100, min_pair_count=2)
    # alphabet (sorted) then merges in learn order
    alpha = ["[UNK]", "##b", "##d", "a", "b", "c"]
    assert list(m.vocab[: len(alpha)]) == alpha
    merges = list(m.vocab[len(alpha):])
    assert merges[0] == "cd"
    assert merges[1] == "ab"  # second round: only (a,##b) remains


def test_train_tie_breaks_are_deterministic():
    """Equal exact scores → higher pair count wins; equal counts too
    → lexicographically smaller pair. 'xy' x2 and 'ab' x2 produce
    identical (count, score) structures, so ('a','##b') merges
    first."""
    hist = {"xy": 2, "ab": 2}
    m = train_wordpiece_from_hist(hist, vocab_size=8)
    first_merge = m.vocab[5]  # after [UNK] + 4 alphabet symbols
    assert first_merge == "ab"


def test_train_min_pair_count_stops_early():
    hist = {"ab": 1, "cd": 1}
    m = train_wordpiece_from_hist(hist, vocab_size=100, min_pair_count=2)
    # nothing reaches count 2 → vocab is [UNK] + alphabet only
    assert set(m.vocab) == {"[UNK]", "a", "##b", "c", "##d"}


def test_train_exact_fraction_compare():
    """Scores that collide in float64 but differ exactly: counts
    chosen so c1/(a1*b1) vs c2/(a2*b2) differ by ~1e-18. Cross-
    multiplied integers keep them ordered."""
    from fractions import Fraction

    hist = {
        "ab": 7, "a": 7 * 10**8, "b": 1,
        "cd": 699999999, "c": 10**9, "d": 1,
    }
    # the winner is decided against Fraction (exact), not a guess
    m = train_wordpiece_from_hist(hist, vocab_size=8, min_pair_count=1)
    sym = {
        "a": 7 * 10**8 + 7,        # 'ab' occurrences + bare 'a'
        "##b": 7,
        "c": 10**9 + 699999999,
        "##d": 699999999,
    }
    s_ab = Fraction(7, sym["a"] * sym["##b"])
    s_cd = Fraction(699999999, sym["c"] * sym["##d"])
    assert s_ab != s_cd  # the fixture must actually discriminate
    want_first = "ab" if s_ab > s_cd else "cd"
    # vocab = [UNK] + 6 alphabet symbols, then the first merge
    assert m.vocab[7] == want_first


def test_learn_wordpiece_spark_histogram(spark):
    """The Spark learner over a tiny corpus equals the pure trainer
    over the same hand-counted histogram."""
    docs = spark.createDataFrame(
        [(0, "ab ab a"), (1, "a b b cd"), (2, "cd cd b")],
        "doc_id long, text string",
    )
    m = learn_wordpiece(docs, vocab_size=12, min_pair_count=2)
    ref = train_wordpiece_from_hist(
        {"ab": 2, "a": 2, "b": 3, "cd": 3}, 12, min_pair_count=2
    )
    assert m == ref


# ------------------------------------------------------------ spark paths


@pytest.fixture(scope="module")
def docs_model(spark):
    from etl_data_lake_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    model = learn_wordpiece(docs, vocab_size=400, max_words=5_000)
    return docs, model


def test_spark_counts_bit_equal_to_reference(docs_model):
    from etl_data_lake_spark.functions.bpe import split_words

    docs, model = docs_model
    got = {
        r["doc_id"]: r["n_wordpiece_tokens"]
        for r in wordpiece_token_counts(docs, model)
        .select("doc_id", "n_wordpiece_tokens")
        .collect()
    }
    ref_rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(ref_rows) > 0
    for r in ref_rows:
        want = sum(
            len(wordpiece_encode(w, model))
            for w in split_words(r["text"] or "")
        )
        assert got[r["doc_id"]] == want


def test_spark_tokens_df_bit_equal_and_unk_rate(docs_model):
    from etl_data_lake_spark.functions.bpe import split_words

    docs, model = docs_model
    got = {
        r["doc_id"]: r["wp_tokens"]
        for r in wordpiece_tokens_df(docs, model).collect()
    }
    sample = docs.select("doc_id", "text").limit(50).collect()
    for r in sample:
        want = [
            p
            for w in split_words(r["text"] or "")
            for p in wordpiece_encode(w, model)
        ]
        assert got[r["doc_id"]] == want
    # the fixture corpus is ASCII-ish prose over its own histogram —
    # a 400-piece vocab must cover its alphabet, so UNKs are rare
    total = sum(len(v) for v in got.values())
    unks = sum(v.count(model.unk_token) for v in got.values())
    assert total > 0 and unks / total < 0.05


# ------------------------------------------------------------ persistence


def test_save_load_round_trip(tmp_path, docs_model):
    docs, model = docs_model
    p = tmp_path / "wp.json"
    save_wordpiece(str(p), model)
    loaded = load_tokenizer(str(p))
    assert loaded == model
    # byte-stable re-save
    save_wordpiece(str(p.with_suffix(".2.json")), loaded)
    assert p.read_bytes() == p.with_suffix(".2.json").read_bytes()
    # encodes identical after reload
    for w in ("the", "supplier", "unaffable", "zzzzqqqq"):
        assert wordpiece_encode(w, loaded) == wordpiece_encode(w, model)


def test_save_rejects_encode_only_model(tmp_path):
    m = WordPieceModel(vocab=frozenset({"[UNK]", "a"}))  # type: ignore
    with pytest.raises(ValueError, match="frozenset"):
        save_wordpiece(str(tmp_path / "x.json"), m)


def test_load_validates(tmp_path):
    import json

    bad = {
        "format": "etl-data-lake-tokenizer",
        "version": 1,
        "type": "wordpiece",
        "vocab": ["a", "a"],
        "unk_token": "[UNK]",
        "max_input_chars": 100,
    }
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="duplicate"):
        load_tokenizer(str(p))
    bad["vocab"] = ["a"]
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="unk_token"):
        load_tokenizer(str(p))
