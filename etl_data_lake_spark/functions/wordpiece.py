"""WordPiece subword tokenization (BERT-style) — the third member of
the tokenizer family next to exact BPE (functions/bpe) and the
unigram LM (functions/unigram), covering the likelihood-scored merge
construction (Schuster & Nakajima 2012; Devlin et al. 2019) and the
greedy longest-match-first encoder every BERT-class model ships.

Same LEARN/ENCODE split as its siblings, for the same scale reasons:

* LEARN (:func:`learn_wordpiece`): the ONE distributed aggregation is
  :func:`functions.bpe.word_histogram` (tokenize → explode →
  groupBy(word) count, bounded to ``max_words``); the merge loop runs
  DRIVER-SIDE over that histogram — the published trainers (the BERT
  and SentencePiece repos, the HF tokenizers reimplementation) all
  train over a word-frequency table, and distinct-words ≪ tokens
  keeps it constant-sized even at 100 TB.
* ENCODE (:func:`wordpiece_token_counts` / :func:`wordpiece_tokens_df`):
  the vocabulary broadcasts in the UDF closure; documents encode in
  Arrow-batched pandas UDFs with a per-batch word→encoding cache
  (Zipf ⇒ the match loop runs once per DISTINCT word per batch).
  One corpus scan, zero shuffles, no driver involvement.

What distinguishes WordPiece from BPE (and what the tests pin):

* MERGE SCORE: BPE merges the most FREQUENT adjacent pair; WordPiece
  merges the pair maximizing ``count(ab) / (count(a)·count(b))`` —
  the unigram-LM likelihood gain of fusing the pair. The trainer
  compares scores in EXACT integer arithmetic (cross-multiplied
  fractions, no float rounding) with count-then-lexicographic
  tie-breaks, so training is bit-deterministic across platforms.
* CONTINUATION MARKER: non-initial symbols carry the ``##`` prefix;
  merging ``(a, ##b)`` yields ``a+b`` (the marker belongs to the
  word POSITION, not the piece), so the learned vocabulary is
  position-aware — ``##s`` the suffix is a different piece from
  ``s`` the word start.
* ENCODE is NOT the merge replay: BERT's encoder greedily takes the
  LONGEST vocabulary prefix, then the longest ``##``-continuation,
  and a word with any unmatchable remainder encodes as ONE
  ``[UNK]`` token (unlike byte-level BPE there is genuinely an UNK —
  the alphabet is open). ``max_input_chars`` guards the quadratic
  scan on pathological unbroken strings exactly as BERT's reference
  encoder does.

Determinism: training is a pure function of the histogram; encoding
is a pure function of (word, vocab). The Spark paths call the same
:func:`wordpiece_encode` inside the Arrow batches as the pure-Python
reference, so engine and reference are bit-equal by construction
(pinned over the real documents fixture in tests/test_wordpiece.py).
"""

from __future__ import annotations

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

from etl_data_lake_spark.functions.bpe import split_words, word_histogram

_CONT = "##"


class WordPieceModel(NamedTuple):
    """An ordered piece vocabulary (alphabet first, then merges in
    learn order — the order is the training transcript, kept for
    audits and byte-stable persistence), the UNK token, and the
    per-word length guard."""

    vocab: tuple[str, ...]
    unk_token: str = "[UNK]"
    max_input_chars: int = 100


def _symbolize(word: str) -> tuple[str, ...]:
    """A word's initial symbols: first character bare, the rest
    ``##``-prefixed (the marker encodes word position)."""
    return (word[0], *(_CONT + c for c in word[1:]))


def _merge_symbol(a: str, b: str) -> str:
    """Fusing ``(a, b)``: the right side's continuation marker is
    positional, so it is consumed by the fusion."""
    return a + (b[len(_CONT):] if b.startswith(_CONT) else b)


def train_wordpiece_from_hist(
    hist: dict[str, int],
    vocab_size: int,
    min_pair_count: int = 2,
    unk_token: str = "[UNK]",
    max_input_chars: int = 100,
) -> WordPieceModel:
    """The WordPiece merge loop over a word histogram — pure Python,
    pure function of its inputs (the Spark learner feeds it the
    distributed histogram; tests feed it hand fixtures).

    Each round scores every adjacent symbol pair by
    ``count(pair) / (count(left)·count(right))`` and fuses the best;
    scores compare EXACTLY via cross-multiplication (all counts are
    integers), ties break by higher pair count then lexicographically
    smaller pair, so the learned vocabulary is bit-deterministic.
    Stops at ``vocab_size`` pieces, or early when no pair reaches
    ``min_pair_count`` (fusing singletons would memorize the tail).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    words: dict[tuple[str, ...], int] = {}
    for w, c in hist.items():
        if w:
            sym = _symbolize(w)
            words[sym] = words.get(sym, 0) + c
    # alphabet = every initial symbol, sorted (deterministic base)
    alphabet = sorted({s for sym in words for s in sym})
    vocab: list[str] = [unk_token, *alphabet]
    seen = set(vocab)
    while len(vocab) < vocab_size:
        pair_counts: Counter = Counter()
        sym_counts: Counter = Counter()
        for sym, c in words.items():
            for s in sym:
                sym_counts[s] += c
            for pair in zip(sym, sym[1:]):
                pair_counts[pair] += c
        if not pair_counts:
            break
        # best score = c_ab / (c_a * c_b), compared exactly:
        # ab beats xy  iff  c_ab * c_x * c_y > c_xy * c_a * c_b
        best: tuple[str, str] | None = None
        best_num = best_den = 1
        for pair, c_ab in pair_counts.items():
            den = sym_counts[pair[0]] * sym_counts[pair[1]]
            if best is None:
                better = True
            else:
                lhs, rhs = c_ab * best_den, best_num * den
                better = lhs > rhs or (
                    lhs == rhs
                    and (
                        c_ab > pair_counts[best]
                        or (c_ab == pair_counts[best] and pair < best)
                    )
                )
            if better:
                best, best_num, best_den = pair, c_ab, den
        if best is None or pair_counts[best] < min_pair_count:
            break
        a, b = best
        merged = _merge_symbol(a, b)
        out: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            if a not in sym:
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
        if merged not in seen:  # re-deriving an alphabet symbol is legal
            vocab.append(merged)
            seen.add(merged)
    return WordPieceModel(
        vocab=tuple(vocab),
        unk_token=unk_token,
        max_input_chars=max_input_chars,
    )


def learn_wordpiece(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> WordPieceModel:
    """Learn a WordPiece vocabulary from the corpus: ONE distributed
    histogram aggregation (shared with BPE/unigram — see module
    docstring), then the driver-side merge loop."""
    hist = word_histogram(docs, text_col, max_words)
    return train_wordpiece_from_hist(
        hist, vocab_size, min_pair_count=min_pair_count
    )


def wordpiece_encode(word: str, model: WordPieceModel) -> list[str]:
    """BERT's greedy longest-match-first encoder, as a pure function
    of (word, model): take the longest vocabulary prefix, then
    repeatedly the longest ``##``-continuation; any unmatchable
    remainder (or an over-length word) makes the WHOLE word one
    ``unk_token``. The Spark paths run this same function inside
    their Arrow batches."""
    if not word:
        return []
    if len(word) > model.max_input_chars:
        return [model.unk_token]
    vocab = model.vocab if isinstance(model.vocab, frozenset) else (
        frozenset(model.vocab)
    )
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur: str | None = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = _CONT + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [model.unk_token]
        pieces.append(cur)
        start = end
    return pieces


def _broadcastable(model: WordPieceModel) -> WordPieceModel:
    """Swap the ordered vocab tuple for a frozenset once, so the
    encode loop's membership tests don't rebuild it per word."""
    return WordPieceModel(
        vocab=frozenset(model.vocab),  # type: ignore[arg-type]
        unk_token=model.unk_token,
        max_input_chars=model.max_input_chars,
    )


def wordpiece_token_counts(
    docs: DataFrame,
    model: WordPieceModel,
    text_col: str = "text",
    out_col: str = "n_wordpiece_tokens",
) -> DataFrame:
    """→ input columns plus ``out_col``: the exact WordPiece token
    count of each document — same contract as
    :func:`functions.bpe.bpe_token_counts` (broadcast vocab,
    Arrow-batched, per-batch word cache, zero shuffles)."""
    if out_col in docs.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )
    m = _broadcastable(model)

    @F.pandas_udf(LongType())
    def n_wp(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(text: str) -> int:
            if text is None:
                return 0
            total = 0
            for w in split_words(text):
                n = cache.get(w)
                if n is None:
                    n = len(wordpiece_encode(w, m))
                    cache[w] = n
                total += n
            return total

        return texts.map(count)

    return docs.withColumn(out_col, n_wp(F.col(text_col)))


def wordpiece_tokens_df(
    docs: DataFrame,
    model: WordPieceModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, wp_tokens array<string>)`` — the full encoding,
    for vocabulary audits and UNK-rate measurement (counts are the
    hot path; this materializes the pieces)."""
    m = _broadcastable(model)
    out_schema = StructType(
        [
            StructField("doc_id", docs.schema[id_col].dataType),
            StructField("wp_tokens", ArrayType(StringType())),
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
                            enc = wordpiece_encode(w, m)
                            cache[w] = enc
                        pieces.extend(enc)
                toks.append(pieces)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "wp_tokens": toks}
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, schema=out_schema
    )
