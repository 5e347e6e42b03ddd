"""Tokenizer persistence (functions/tokenizer_io): exact round-trips
for BPE merges and unigram models — loaded artifacts encode
bit-identically — plus byte-deterministic re-saves and loud failures
on foreign/corrupt/unversioned files."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.bpe import bpe_encode, _ranks, learn_bpe
from etl_data_lake_spark.functions.tokenizer_io import (
    load_tokenizer,
    save_bpe,
    save_unigram,
)
from etl_data_lake_spark.functions.unigram import (
    learn_unigram,
    unigram_encode,
)
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(200)


def test_bpe_round_trip_encodes_identically(spark, docs, tmp_path):
    merges = learn_bpe(docs, n_merges=50)
    p = str(tmp_path / "bpe.json")
    save_bpe(p, merges)
    loaded = load_tokenizer(p)
    assert loaded == merges
    ranks, lranks = _ranks(merges), _ranks(loaded)
    words = ["sparkles", "windowing", "join", "übergröße"]
    assert [bpe_encode(w, ranks) for w in words] == [
        bpe_encode(w, lranks) for w in words
    ]


def test_unigram_round_trip_encodes_identically(spark, docs, tmp_path):
    model = learn_unigram(docs, vocab_size=120, em_iters=1)
    p = str(tmp_path / "uni.json")
    save_unigram(p, model)
    loaded = load_tokenizer(p)
    assert loaded == model  # frozen dataclass: field-exact equality
    words = ["sparkles", "windowing", "join", "übergröße", "zzz"]
    assert [unigram_encode(w, model) for w in words] == [
        unigram_encode(w, loaded) for w in words
    ]


def test_resave_is_byte_identical(spark, docs, tmp_path):
    model = learn_unigram(docs, vocab_size=80, em_iters=1)
    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    save_unigram(a, model)
    save_unigram(b, load_tokenizer(a))
    assert open(a, "rb").read() == open(b, "rb").read()
    merges = learn_bpe(docs, n_merges=30)
    c, d = str(tmp_path / "c.json"), str(tmp_path / "d.json")
    save_bpe(c, merges)
    save_bpe(d, load_tokenizer(c))
    assert open(c, "rb").read() == open(d, "rb").read()


def test_load_rejects_foreign_and_corrupt(tmp_path):
    p = str(tmp_path / "x.json")
    with open(p, "w") as f:
        json.dump({"hello": 1}, f)
    with pytest.raises(ValueError, match="not a"):
        load_tokenizer(p)
    with open(p, "w") as f:
        json.dump(
            {"format": "etl-data-lake-tokenizer", "version": 99,
             "type": "bpe", "merges": []},
            f,
        )
    with pytest.raises(ValueError, match="version"):
        load_tokenizer(p)
    with open(p, "w") as f:
        json.dump(
            {"format": "etl-data-lake-tokenizer", "version": 1,
             "type": "trie"},
            f,
        )
    with pytest.raises(ValueError, match="unknown tokenizer type"):
        load_tokenizer(p)
    with open(p, "w") as f:
        json.dump(
            {"format": "etl-data-lake-tokenizer", "version": 1,
             "type": "unigram", "max_piece_len": 4, "unk_logp": -20.0,
             "pieces": ["a", "b"], "logp": {"a": -1.0}},
            f,
        )
    with pytest.raises(ValueError, match="disagree"):
        load_tokenizer(p)
