"""Exact BPE tokenization (functions/bpe): hand-computed merges on a
classic corpus, bit-equality of the Spark encode against the
pure-Python reference over the real documents fixture, and the
packing composition the exact counts exist for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.bpe import (
    bpe_encode,
    bpe_token_counts,
    bpe_tokens_df,
    learn_bpe,
    split_words,
)
from tests.conftest import SF_DIR


def test_learn_bpe_hand_computed(spark):
    """The textbook example: corpus of low/lower/newest/widest-style
    words with known counts; the first merges are forced by the
    frequencies and the lexicographic tie-break is deterministic."""
    rows = []
    did = 0
    for word, n in [("aaab", 4), ("aab", 2), ("ab", 1)]:
        for _ in range(n):
            rows.append((did, word))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(docs, n_merges=10, max_words=100)
    # pair counts round 1: ('a','a') = 4*2 + 2*1 = 10, ('a','b') = 7
    assert merges[0] == ("a", "a")
    # round 2: words are (aa,a,b)x4 (aa,b)x2 (a,b)x1 →
    # ('aa','a')=4, ('a','b')=5, ('aa','b')=2 → ('a','b') wins
    assert merges[1] == ("a", "b")
    # under the FULL learned table the most frequent word merges all
    # the way to a single token; truncating the table to the first two
    # merges reproduces the intermediate segmentation
    full = {p: i for i, p in enumerate(merges)}
    assert bpe_encode("aaab", full) == ["aaab"]
    first_two = {p: i for i, p in enumerate(merges[:2])}
    assert bpe_encode("aaab", first_two) == ["aa", "ab"]


def test_learn_bpe_tie_break_is_lexicographic(spark):
    docs = spark.createDataFrame(
        [(0, "xy xy"), (1, "ab ab")], "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=1)
    # ('a','b') and ('x','y') both count 2 → lexicographically smallest
    assert merges == [("a", "b")]


def test_spark_counts_bit_equal_to_reference(spark):
    """bpe_token_counts over the REAL documents fixture == summing the
    pure-Python encoder per word, doc by doc — the exactness contract
    that replaces the len/4 estimate."""
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = learn_bpe(docs, n_merges=200)
    assert len(merges) > 50  # the loop actually learned a table
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = sum(
            len(bpe_encode(w, ranks)) for w in split_words(r["text"])
        )
        assert got[r["doc_id"]] == want
    # full-encoding surface agrees with the counts
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokens_df(docs, merges).collect()
    }
    assert all(len(enc[d]) == n for d, n in got.items())


def test_detokenization_round_trip(spark):
    """Concatenating a word's pieces recovers the word exactly —
    merges never lose characters."""
    docs = spark.createDataFrame(
        [(0, "tokenization internalization"), (1, "token internal")],
        "doc_id long, text string",
    )
    merges = learn_bpe(docs, n_merges=20, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["tokenization", "internalization", "unseen"]:
        assert "".join(bpe_encode(w, ranks)) == w


def test_exact_counts_feed_packing(spark):
    """The composition the exactness exists for: pack_sequences over
    n_bpe_tokens yields packs whose budgets hold for TRUE token
    counts."""
    from etl_data_lake_spark.operators.packing import pack_sequences
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = learn_bpe(docs, n_merges=100)
    counted = bpe_token_counts(docs, merges)
    budget = 600
    packed = pack_sequences(
        counted.select("doc_id", "n_bpe_tokens"),
        token_col="n_bpe_tokens",
        budget=budget,
    )
    per_pack = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_bpe_tokens").alias("t"))
        .collect()
    )
    assert per_pack and all(r["t"] <= budget for r in per_pack)
    # nothing dropped
    assert packed.count() == docs.count()


def test_validation_and_out_col_clash(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe(docs, n_merges=0)
    with pytest.raises(ValueError, match="max_words"):
        learn_bpe(docs, n_merges=1, max_words=0)
    with pytest.raises(ValueError, match="n_bpe_tokens"):
        bpe_token_counts(
            docs.withColumn("n_bpe_tokens", F.lit(1)), [("a", "b")]
        )


def test_learn_and_encode_share_one_whitespace_class(spark):
    """NBSP is NOT a word boundary (Java \\s is ASCII): a hot
    NBSP-fused phrase must be learned AND encoded as one word — the
    learn/encode tokenizer-mismatch regression."""
    docs = spark.createDataFrame(
        [(i, "prix fixe menu") for i in range(5)],
        "doc_id long, text string",
    )
    assert split_words("prix fixe menu") == ["prix fixe", "menu"]
    merges = learn_bpe(docs, n_merges=30, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    # the fused word fully merges under the learned table...
    assert bpe_encode("prix fixe", ranks) == ["prix fixe"]
    # ...and the Spark encode counts it as ONE token per doc (plus
    # 'menu'), proving both sides split identically
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert set(got.values()) == {2}


def test_split_words_edge_whitespace_matches_learn_side(spark):
    """Spark trim strips only ASCII space, so an edge-NBSP word stays
    fused on the learn side — split_words must keep it fused too
    (second-review regression: Unicode str.strip() sheared it)."""
    assert split_words("  prix fixe menu　 ") == [
        " prix fixe",
        "menu　",
    ]
    docs = spark.createDataFrame(
        [(0, "  prix fixe menu　 ")],
        "doc_id long, text string",
    )
    from etl_data_lake_spark.functions.text import tokens
    from pyspark.sql import functions as FF

    learn_words = docs.select(
        FF.explode(FF.filter(tokens("text"), lambda t: t != "")).alias("w")
    ).collect()
    assert [r["w"] for r in learn_words] == split_words(
        "  prix fixe menu　 "
    )


# ------------------------------------------------------ byte level --
# Round 10 (verdict #5): the GPT-2/Llama-class alphabet — a word's
# UTF-8 bytes through the public byte<->unicode bijection, so the
# base vocabulary is CLOSED at 256 and encoding never needs UNK.


def test_byte_bijection_is_exact():
    from etl_data_lake_spark.functions.bpe import (
        _BYTE_DEC,
        _BYTE_ENC,
        byte_bpe_decode,
        byte_symbols,
    )

    assert len(_BYTE_ENC) == 256
    assert len(set(_BYTE_ENC.values())) == 256  # bijective
    assert _BYTE_DEC == {c: b for b, c in _BYTE_ENC.items()}
    # every mapped symbol is one printable character
    assert all(len(c) == 1 and c.isprintable() for c in _BYTE_ENC.values())
    for w in ["hello", "naïve", "東京", "🚀🚀", "Ωμέγα", "a\tb"]:
        assert byte_bpe_decode(byte_symbols(w)) == w


def test_learn_byte_bpe_merges_multibyte_chars(spark):
    """A hot non-ASCII word's UTF-8 bytes merge back together in the
    first rounds — the learner treats multi-byte sequences like any
    frequent pair, and the FULL table collapses the word to one
    token that decodes exactly."""
    from etl_data_lake_spark.functions.bpe import (
        byte_bpe_decode,
        byte_bpe_encode,
        learn_byte_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "café café 東京") for i in range(5)],
        "doc_id long, text string",
    )
    merges = learn_byte_bpe(docs, n_merges=30, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["café", "東京"]:
        enc = byte_bpe_encode(w, ranks)
        assert enc == [enc[0]] and len(enc) == 1  # fully merged
        assert byte_bpe_decode(enc) == w


def test_byte_level_never_falls_back(spark):
    """Words in scripts NEVER seen at train time still encode — into
    base-alphabet symbols only — and decode exactly. This is the
    closed-vocabulary property character-level BPE cannot offer."""
    from etl_data_lake_spark.functions.bpe import (
        _BYTE_ENC,
        byte_bpe_decode,
        byte_bpe_encode,
        learn_byte_bpe,
    )

    docs = spark.createDataFrame(
        [(0, "plain ascii training text only")],
        "doc_id long, text string",
    )
    merges = learn_byte_bpe(docs, n_merges=10, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    base = set(_BYTE_ENC.values())
    vocab = base | {a + b for a, b in merges}
    for w in ["Здравствуйте", "日本語テキスト", "🧪", "naïve"]:
        enc = byte_bpe_encode(w, ranks)
        assert all(p in vocab for p in enc)
        assert byte_bpe_decode(enc) == w


def test_byte_level_spark_bit_equal_to_reference(spark):
    """The Spark encode (counts AND pieces) over the REAL documents
    fixture == the pure-Python byte-level reference per word."""
    from etl_data_lake_spark.functions.bpe import (
        byte_bpe_encode,
        learn_byte_bpe,
    )
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = learn_byte_bpe(docs, n_merges=200)
    assert len(merges) > 50
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges, byte_level=True).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = sum(
            len(byte_bpe_encode(w, ranks))
            for w in split_words(r["text"])
        )
        assert got[r["doc_id"]] == want
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokens_df(docs, merges, byte_level=True).collect()
    }
    assert all(len(enc[d]) == n for d, n in got.items())


def test_byte_level_tokenizer_io_round_trip(spark, tmp_path):
    """save/load with byte_level composes with tokenizer_io: the
    artifact comes back as ByteBpeModel (never silently confusable
    with a character-level list) and encodes bit-identically."""
    from etl_data_lake_spark.functions.bpe import (
        ByteBpeModel,
        byte_bpe_encode,
        learn_byte_bpe,
    )
    from etl_data_lake_spark.functions.tokenizer_io import (
        load_tokenizer,
        save_bpe,
    )

    docs = spark.createDataFrame(
        [(0, "café tokenization café 東京 tokenization")],
        "doc_id long, text string",
    )
    merges = learn_byte_bpe(docs, n_merges=25, min_pair_count=1)
    p = tmp_path / "byte_bpe.json"
    save_bpe(p, merges, byte_level=True)
    loaded = load_tokenizer(p)
    assert isinstance(loaded, ByteBpeModel)
    assert loaded.merges == merges
    ranks = {pr: i for i, pr in enumerate(loaded.merges)}
    ranks0 = {pr: i for i, pr in enumerate(merges)}
    for w in ["café", "東京", "tokenization", "unseen"]:
        assert byte_bpe_encode(w, ranks) == byte_bpe_encode(w, ranks0)
    # a character-level artifact still loads as the plain list
    save_bpe(tmp_path / "char_bpe.json", merges)
    assert load_tokenizer(tmp_path / "char_bpe.json") == merges
