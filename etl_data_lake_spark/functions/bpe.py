"""Exact byte-pair-encoding tokenization — learn a merges table from
the corpus, encode documents with it, and count TRUE subword tokens
(replacing the ``len/4`` "BPE-ish estimate" in
queries/text_queries.text_token_counts for budgets that must be
exact: sequence packing, context-window chunking, token-priced
mixtures).

The split of labor mirrors how production tokenizers are actually
trained and deployed at corpus scale:

* LEARN (:func:`learn_bpe`): ONE distributed aggregation builds the
  word histogram (tokenize → explode → groupBy(word) count; the
  shuffle carries distinct words, map-side combined), bounded to the
  ``max_words`` most frequent words (TakeOrderedAndProject — the
  same deterministic truncation as functions/lm.py's vocabulary).
  The classic BPE merge loop then runs DRIVER-SIDE over that
  histogram — this is not a shortcut but the standard algorithm
  (GPT-2/sentencepiece train over a word-frequency table, not the
  raw corpus): the histogram is small even at 100 TB because
  distinct-words ≪ tokens, and the cap makes it constant.
* ENCODE (:func:`bpe_token_counts` / :func:`bpe_tokens_df`): the
  merges table broadcasts in the UDF closure (≤ n_merges pairs) and
  documents encode in Arrow-batched pandas UDFs with a per-batch
  word→encoding cache — word frequency follows Zipf, so the cache
  hit-rate is high and the merge loop runs once per DISTINCT word
  per batch, not once per occurrence. One corpus scan, zero
  shuffles, no driver involvement.

Determinism: merge selection breaks frequency ties by lexicographic
pair order, and encoding is a pure function of (word, merges) — the
pure-Python reference encoder (:func:`bpe_encode`) and the Spark path
are bit-equal by construction and pinned so in tests/test_bpe.py.

Two alphabets share the merge/encode machinery (round 10 added the
second):

* CHARACTER-level (:func:`learn_bpe` / :func:`bpe_encode`) — symbols
  are the word's characters. Simple, but the base alphabet is
  unbounded: a character never seen at train time stays its own
  symbol forever, so the effective vocabulary is open.
* BYTE-level (:func:`learn_byte_bpe` / :func:`byte_bpe_encode`) —
  the GPT-2/Llama-class alphabet: a word's UTF-8 BYTES, each mapped
  through the public GPT-2 byte↔unicode bijection so every symbol is
  a printable character (merges stay plain string pairs, the same
  JSON-persistable shape tokenizer_io already stores). The base
  alphabet is CLOSED at 256: any text in any script encodes with
  zero fallback — there is no UNK by construction — and
  :func:`byte_bpe_decode` inverts exactly (bytes → UTF-8), pinned by
  non-ASCII round-trip tests.

Tokenization here is whitespace-word-level either way; a GPT-2
deployment would swap the pre-tokenizer (the ``_BPE_PAT`` regex in
queries/text_queries) — the merge/encode machinery is identical.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_data_lake_spark.functions.text import tokens

Merges = list[tuple[str, str]]


class ByteBpeModel(NamedTuple):
    """A byte-level merge list, distinguishable from a character-level
    one at load time: tokenizer_io returns this for ``byte_level``
    artifacts so a caller can't silently encode a byte-level model
    with the character alphabet (or vice versa)."""

    merges: Merges

# Encode-side word splitter, pinned to the SAME whitespace class the
# learn side's tokens() uses (Java \s+ = ASCII [ \t\n\x0B\f\r]).
# Python's str.split() is Unicode-aware (NBSP etc. split there but
# not in Spark), so a frequent 'prix\xa0fixe' would be LEARNED fused
# yet ENCODED split — merges trained for exactly the corpus's hot
# phrases would never apply. One tokenizer, both sides.
_WS = re.compile(r"\s+", re.ASCII)


def split_words(text: str) -> list[str]:
    """The shared learn/encode word splitter, reproducing the learn
    side EXACTLY: Spark's ``trim`` strips only ASCII space (not even
    tab), the Java ``\\s+`` split is ASCII, and empty tokens filter
    out — so the edge-NBSP word ``'\\xa0prix'`` stays fused on BOTH
    sides (a Unicode-aware ``str.strip()`` here would shear it on the
    encode side only)."""
    return [w for w in _WS.split(text.strip(" ")) if w]


def word_histogram(
    docs: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> dict[str, int]:
    """ONE distributed aggregation → the ``max_words`` most frequent
    words with counts (deterministic truncation: count desc, word
    asc). The shared LEARN substrate for BPE and the unigram-LM
    tokenizer (functions/unigram) — distinct-words ≪ tokens, so the
    shuffle carries the small side and the driver gets a bounded
    dict."""
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    hist_rows = (
        docs.select(
            F.explode(
                F.filter(tokens(text_col), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(max_words)
        .collect()
    )
    return {r["word"]: r["c"] for r in hist_rows}


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> Merges:
    """Learn up to ``n_merges`` merge rules from the corpus word
    histogram. Returns the merges in priority order (rank = list
    index). Stops early when no adjacent pair reaches
    ``min_pair_count`` — merging singletons would just memorize the
    tail."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    hist = word_histogram(docs, text_col, max_words)
    return _merge_loop(
        {tuple(w): c for w, c in hist.items()}, n_merges,
        min_pair_count,
    )


def _merge_loop(
    words: dict[tuple[str, ...], int],
    n_merges: int,
    min_pair_count: int,
) -> Merges:
    """The classic BPE training loop over a symbolized word histogram
    — shared by the character- and byte-level learners (the alphabet
    is the only thing that differs between them)."""
    merges: Merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for sym, c in words.items():
            for pair in zip(sym, sym[1:]):
                pair_counts[pair] += c
        if not pair_counts:
            break
        # deterministic: max count, lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merged = a + b
        out: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            if a not in sym:  # cheap pre-filter; tuples support `in`
                out[sym] = out.get(sym, 0) + c
                continue
            res = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            t = tuple(res)
            out[t] = out.get(t, 0) + c
        words = out
        merges.append((a, b))
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Pure-Python reference encoder: repeatedly merge the
    lowest-rank adjacent pair (the canonical GPT-2 ``bpe()`` loop).
    The Spark path calls this same function inside the Arrow batches,
    so engine and reference cannot diverge."""
    return _encode_symbols(list(word), ranks)


def _encode_symbols(
    sym: list[str], ranks: dict[tuple[str, str], int]
) -> list[str]:
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge EVERY occurrence of the chosen pair left-to-right
        a, b = sym[best_i], sym[best_i + 1]
        res = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(sym[i])
                i += 1
        sym = res
    return sym


def _ranks(merges: Merges) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


# ---------------------------------------------------------------------------
# Byte-level alphabet (round-10 verdict #5) — the GPT-2 byte↔unicode
# bijection (Radford et al. 2019, the public gpt-2 repo's
# bytes_to_unicode): the 188 printable latin-1 bytes map to
# themselves, the 68 others (controls, space, DEL, soft hyphen …) to
# U+0100.. so every byte is a PRINTABLE single character — symbols
# stay plain strings, merges stay JSON-persistable string pairs, and
# no byte ever collides with another's mapped form (it is a
# bijection, so decode is exact).
# ---------------------------------------------------------------------------


def _bytes_to_unicode() -> dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_ENC = _bytes_to_unicode()
_BYTE_DEC = {c: b for b, c in _BYTE_ENC.items()}


def byte_symbols(word: str) -> list[str]:
    """A word's initial byte-level symbols: its UTF-8 bytes, each as
    the bijection's printable character. The alphabet is CLOSED — any
    word in any script symbolizes, so byte-level encoding never needs
    an UNK fallback."""
    return [_BYTE_ENC[b] for b in word.encode("utf-8")]


def learn_byte_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> Merges:
    """Learn merges over the byte alphabet — same histogram, same
    driver-side loop as :func:`learn_bpe`, only the initial
    symbolization differs. The merges compose multi-byte UTF-8
    sequences exactly like any other frequent pair: a hot non-ASCII
    character's bytes merge back together in the first rounds."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    hist = word_histogram(docs, text_col, max_words)
    return _merge_loop(
        {tuple(byte_symbols(w)): c for w, c in hist.items()},
        n_merges, min_pair_count,
    )


def byte_bpe_encode(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Pure-Python byte-level reference encoder (the Spark path runs
    this same function inside the Arrow batches)."""
    return _encode_symbols(byte_symbols(word), ranks)


def byte_bpe_decode(pieces: list[str]) -> str:
    """Exact inverse of :func:`byte_bpe_encode` for one word: map the
    pieces' characters back to their bytes and UTF-8-decode."""
    return bytes(
        _BYTE_DEC[c] for piece in pieces for c in piece
    ).decode("utf-8")


def bpe_token_counts(
    docs: DataFrame,
    merges: Merges,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    byte_level: bool = False,
) -> DataFrame:
    """→ input columns plus ``out_col``: the EXACT subword count of
    each document under the merges table — the drop-in token budget
    for operators/packing.pack_sequences and chunking. Arrow-batched;
    per-batch word cache (see module docstring). ``byte_level``
    selects the alphabet and must match how ``merges`` was learned."""
    if out_col in docs.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    ranks = _ranks(merges)
    encode = byte_bpe_encode if byte_level else bpe_encode

    @F.pandas_udf(LongType())
    def n_bpe(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(text: str) -> int:
            if text is None:
                return 0
            total = 0
            for w in split_words(text):
                n = cache.get(w)
                if n is None:
                    n = len(encode(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(count)

    return docs.withColumn(out_col, n_bpe(F.col(text_col)))


def bpe_tokens_df(
    docs: DataFrame,
    merges: Merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
) -> DataFrame:
    """→ ``(doc_id, bpe_tokens array<string>)`` — the full encoding,
    for vocabulary audits and detokenization round-trip tests (token
    COUNTS are the hot path; this materializes the pieces).
    ``byte_level`` selects the alphabet and must match the learn."""
    ranks = _ranks(merges)
    encode = byte_bpe_encode if byte_level else bpe_encode
    out_schema = StructType(
        [
            StructField("doc_id", docs.schema[id_col].dataType),
            StructField("bpe_tokens", ArrayType(StringType())),
        ]
    )

    def encode_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks = []
            for text in pdf[text_col]:
                pieces: list[str] = []
                if text is not None:
                    for w in split_words(text):
                        enc = cache.get(w)
                        if enc is None:
                            enc = encode(w, ranks)
                            cache[w] = enc
                        pieces.extend(enc)
                toks.append(pieces)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "bpe_tokens": toks}
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, schema=out_schema
    )
