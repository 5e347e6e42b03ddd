"""HuggingFace tokenizer.json interop (functions/hf_tokenizer.py,
round 12): load a public-format BPE artifact and encode in-plan
(GPT-2 pre-tokenization JVM-side, merges in Arrow batches), export
the repo's byte-BPE as a tokenizer.json, round-trip exactly, and
fail loudly on everything outside the supported subset."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.bpe import (
    _BYTE_ENC,
    byte_bpe_encode,
    _ranks,
    learn_byte_bpe,
)
from etl_data_lake_spark.functions.hf_tokenizer import (
    GPT2_PRE_PATTERN,
    hf_encode_word,
    hf_token_counts,
    hf_token_ids,
    load_hf_tokenizer_json,
    save_hf_tokenizer_json,
)
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def _mini_doc(merges, extra_vocab=(), pre=None, **model_extra):
    vocab = {c: i for i, c in enumerate(_BYTE_ENC[b] for b in range(256))}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    for t in extra_vocab:
        vocab.setdefault(t, len(vocab))
    doc = {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": [f"{a} {b}" for a, b in merges],
            **model_extra,
        },
        "pre_tokenizer": pre
        if pre is not None
        else {"type": "ByteLevel", "add_prefix_space": False},
    }
    return doc, vocab


def test_load_and_encode_gpt2_style(spark, tmp_path):
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("Ġ", "w")]
    doc, vocab = _mini_doc(merges)
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(doc))
    tok = load_hf_tokenizer_json(str(p))
    assert tok.byte_level and not tok.add_prefix_space
    # pure function: 'hello' merges to one piece
    assert hf_encode_word("hello", tok) == [vocab["hello"]]
    # ' world' keeps the GPT-2 leading-space convention: space maps to
    # Ġ and merges with w
    ids = hf_encode_word(" world", tok)
    assert ids[0] == vocab["Ġw"]
    # in-plan: 'hello world' pre-tokenizes to ['hello', ' world']
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    got = hf_token_ids(df, tok).collect()[0].token_ids
    assert got == hf_encode_word("hello", tok) + hf_encode_word(
        " world", tok
    )
    n = hf_token_counts(df, tok).collect()[0].n_hf_tokens
    assert n == len(got)


def test_merges_as_pairs_and_prefix_space(spark, tmp_path):
    merges = [("Ġ", "h"), ("Ġh", "i")]
    doc, vocab = _mini_doc(merges)
    doc["model"]["merges"] = [list(m) for m in merges]  # newer format
    doc["pre_tokenizer"] = {"type": "ByteLevel", "add_prefix_space": True}
    p = tmp_path / "t.json"
    p.write_text(json.dumps(doc))
    tok = load_hf_tokenizer_json(str(p))
    assert tok.add_prefix_space and tok.merges == tuple(merges)
    df = spark.createDataFrame([(1, "hi")], "doc_id long, text string")
    got = hf_token_ids(df, tok).collect()[0].token_ids
    # prefix space: 'hi' encodes as ' hi' → the Ġhi merge fires
    assert got == [vocab["Ġhi"]]


def test_export_round_trip_matches_repo_encoder(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(300)
    merges = learn_byte_bpe(docs, n_merges=80)
    p = tmp_path / "exported.json"
    save_hf_tokenizer_json(str(p), merges)
    tok = load_hf_tokenizer_json(str(p))
    assert tok.merges == tuple(merges)
    ranks = _ranks(merges)
    for w in ("the", "customer", "value", " stream", "zzz-unseen"):
        pieces = byte_bpe_encode(w, ranks)
        assert hf_encode_word(w, tok) == [tok.vocab[x] for x in pieces]
    # and the Spark path agrees with the pure function per pretoken
    sample = spark.createDataFrame(
        [(1, "the customer value stream")], "doc_id long, text string"
    )
    got = hf_token_ids(sample, tok).collect()[0].token_ids
    want = []
    import re as _re  # the GPT-2 split for this ASCII-only sample is
    # reproducible with plain re (no \p classes needed)
    for m in _re.findall(r" ?[a-z]+", "the customer value stream"):
        want += hf_encode_word(m, tok)
    assert got == want


def test_validation_raises_loudly(tmp_path):
    # WordPiece model
    p = tmp_path / "wp.json"
    p.write_text(json.dumps({"model": {"type": "WordPiece", "vocab": {}}}))
    with pytest.raises(ValueError, match="BPE"):
        load_hf_tokenizer_json(str(p))
    # normalizer present
    doc, _ = _mini_doc([("h", "e")])
    doc["normalizer"] = {"type": "NFKC"}
    p2 = tmp_path / "norm.json"
    p2.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="normalizer"):
        load_hf_tokenizer_json(str(p2))
    # exotic pre-tokenizer
    doc2, _ = _mini_doc([("h", "e")], pre={"type": "Metaspace"})
    p3 = tmp_path / "pre.json"
    p3.write_text(json.dumps(doc2))
    with pytest.raises(ValueError, match="pre_tokenizer"):
        load_hf_tokenizer_json(str(p3))
    # merge whose product is missing from the vocab
    doc3, _ = _mini_doc([("h", "e")])
    del doc3["model"]["vocab"]["he"]
    p4 = tmp_path / "gap.json"
    p4.write_text(json.dumps(doc3))
    with pytest.raises(ValueError, match="not in the vocab"):
        load_hf_tokenizer_json(str(p4))
    # byte-level vocab missing base symbols
    doc4, _ = _mini_doc([("h", "e")])
    del doc4["model"]["vocab"]["Ġ"]
    p5 = tmp_path / "base.json"
    p5.write_text(json.dumps(doc4))
    with pytest.raises(ValueError, match="base byte symbols"):
        load_hf_tokenizer_json(str(p5))


def test_char_level_whitespace_and_unk(spark, tmp_path):
    vocab = {"a": 0, "b": 1, "ab": 2, "<unk>": 3}
    doc = {
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": ["a b"],
            "unk_token": "<unk>",
        },
        "pre_tokenizer": {"type": "Whitespace"},
    }
    p = tmp_path / "char.json"
    p.write_text(json.dumps(doc))
    tok = load_hf_tokenizer_json(str(p))
    assert not tok.byte_level
    df = spark.createDataFrame([(1, "ab ba xq")], "doc_id long, text string")
    got = hf_token_ids(df, tok).collect()[0].token_ids
    # 'ab' → merge; 'ba' → b, a; 'xq' → unk, unk
    assert got == [2, 1, 0, 3, 3]
    # without an unk_token the OOV must raise, not fabricate ids
    tok2 = load_hf_tokenizer_json(str(p))
    object.__setattr__(tok2, "unk_token", None)
    with pytest.raises(Exception, match="unk_token"):
        hf_encode_word("xq", tok2)


def test_gpt2_pattern_covers_whitespace_runs(spark):
    """Every character lands in exactly one pretoken (the count
    invariant that makes token budgets exact)."""
    text = "a  b\t\tc\n\nd'ere 12x !?"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = df.select(
        F.regexp_extract_all(
            F.col("text"), F.lit(GPT2_PRE_PATTERN), F.lit(0)
        ).alias("t")
    ).collect()[0].t
    assert "".join(toks) == text


def test_prefix_space_not_doubled_and_added_tokens_guard(spark, tmp_path):
    """Round-12 review fixes: (a) add_prefix_space mirrors ByteLevel —
    prepend ONLY when the text doesn't already start with a space, so
    ' hi' and 'hi' encode identically; (b) added_tokens raise unless
    the caller asserts the corpus can't contain them; (c) a declared
    unk_token missing from the vocab fails at LOAD, not in an
    executor."""
    merges = [("Ġ", "h"), ("Ġh", "i")]
    doc, vocab = _mini_doc(merges)
    doc["pre_tokenizer"] = {"type": "ByteLevel", "add_prefix_space": True}
    p = tmp_path / "t.json"
    p.write_text(json.dumps(doc))
    tok = load_hf_tokenizer_json(str(p))
    df = spark.createDataFrame(
        [(1, "hi"), (2, " hi")], "doc_id long, text string"
    )
    got = {r.doc_id: r.token_ids for r in hf_token_ids(df, tok).collect()}
    assert got[1] == got[2] == [vocab["Ġhi"]]

    doc["added_tokens"] = [{"id": 999, "content": "<|endoftext|>"}]
    p2 = tmp_path / "added.json"
    p2.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="added_tokens"):
        load_hf_tokenizer_json(str(p2))
    tok2 = load_hf_tokenizer_json(str(p2), ignore_added_tokens=True)
    assert tok2.merges == tuple(merges)

    doc2, _ = _mini_doc(merges, unk_token="<unk>")
    p3 = tmp_path / "badunk.json"
    p3.write_text(json.dumps(doc2))
    with pytest.raises(ValueError, match="unk_token"):
        load_hf_tokenizer_json(str(p3))

    doc3, _ = _mini_doc(merges)
    doc3["pre_tokenizer"] = {"type": "ByteLevel", "use_regex": False}
    p4 = tmp_path / "noregex.json"
    p4.write_text(json.dumps(doc3))
    with pytest.raises(ValueError, match="use_regex"):
        load_hf_tokenizer_json(str(p4))
