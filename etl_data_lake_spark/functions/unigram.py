"""Unigram-LM subword tokenization (SentencePiece-style) — the other
half of real tokenizer coverage next to exact BPE (functions/bpe):
learn a piece vocabulary by EM over the corpus word histogram, prune
it to a target size, and encode documents by Viterbi segmentation.

Same LEARN/ENCODE split as BPE, for the same scale reasons:

* LEARN (:func:`learn_unigram`): the ONE distributed aggregation is
  :func:`functions.bpe.word_histogram` (tokenize → explode →
  groupBy(word) count, bounded to ``max_words``); the EM loop — the
  standard unigram-LM training construction (Kudo 2018 trains over a
  word-frequency table, exactly like BPE) — runs DRIVER-SIDE over
  that histogram. Per EM step the cost is O(Σ|word|·max_piece_len)
  over DISTINCT words, independent of corpus size.
* ENCODE (:func:`unigram_token_counts` / :func:`unigram_tokens_df`):
  the model (piece → log-prob) broadcasts in the UDF closure;
  documents encode in Arrow-batched pandas UDFs with a per-batch
  word→encoding cache (Zipf ⇒ the Viterbi DP runs once per distinct
  word per batch). One corpus scan, zero shuffles.

Algorithm (faithful to the published construction, deterministic
throughout):

1. SEED: every substring (length ≤ ``max_piece_len``) of histogram
   words, scored by occurrence-count × word-frequency; keep the
   ``seed_size`` best (count desc, piece asc) plus ALL single
   characters (coverage guarantee — any word stays segmentable).
2. EM: E-step computes each piece's EXPECTED count over the full
   segmentation lattice of every histogram word (forward–backward in
   log space, float64, fixed iteration order); M-step renormalizes
   log-probs from the expected counts.
3. PRUNE: drop to ``shrink`` × |V| pieces by expected count (count
   desc, piece asc; single characters are never dropped — the
   count-based approximation of SentencePiece's loss-based pruning),
   re-run EM, repeat until |V| ≤ ``vocab_size``.
4. ENCODE: Viterbi (max total log-prob; ties prefer FEWER pieces,
   then the longer final piece) — a pure function of (word, model),
   shared verbatim between the Spark path and the pure-Python
   reference, so they are bit-equal by construction
   (tests/test_unigram.py pins it over the real documents fixture).

Characters never seen at train time encode as single-char pieces at
``unk_logp`` — segmentation never fails, round-trip never loses
bytes ("".join(pieces) == word always).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass, field

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

_NEG_INF = float("-inf")


@dataclass(frozen=True)
class UnigramModel:
    """Piece → log-probability, plus the DP horizon and the fallback
    log-prob for unseen characters."""

    logp: dict[str, float]
    max_piece_len: int
    unk_logp: float = -20.0
    # insertion-ordered piece list, for stable serialization/audits
    pieces: tuple[str, ...] = field(default=())

    def __post_init__(self):
        if not self.pieces:
            object.__setattr__(self, "pieces", tuple(sorted(self.logp)))


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == _NEG_INF:
        return _NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _seed_pieces(
    hist: dict[str, int], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Initial vocabulary: substring counts weighted by word
    frequency; top ``seed_size`` by (count desc, piece asc) plus all
    single characters. Returns initial log-probs ∝ counts."""
    counts: dict[str, float] = {}
    for w, c in hist.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0.0) + c
    singles = {p for p in counts if len(p) == 1}
    multis = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )
    keep = singles | set(multis[: max(seed_size - len(singles), 0)])
    total = sum(counts[p] for p in keep)
    logt = math.log(total)
    return {p: math.log(counts[p]) - logt for p in sorted(keep)}


def _em_step(
    hist: dict[str, int],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One E-step: expected piece counts over every histogram word's
    full segmentation lattice (forward–backward, log space), plus the
    corpus log-likelihood. Fixed iteration order ⇒ bit-deterministic."""
    exp_counts: dict[str, float] = {p: 0.0 for p in logp}
    loglik = 0.0
    L = max_piece_len
    for w, c in hist.items():
        n = len(w)
        alpha = [_NEG_INF] * (n + 1)
        alpha[0] = 0.0
        for i in range(1, n + 1):
            terms = []
            for j in range(max(0, i - L), i):
                lp = logp.get(w[j:i])
                if lp is not None and alpha[j] != _NEG_INF:
                    terms.append(alpha[j] + lp)
            if terms:
                alpha[i] = _logsumexp(terms)
        z = alpha[n]
        if z == _NEG_INF:
            continue  # unsegmentable (cannot happen with char coverage)
        beta = [_NEG_INF] * (n + 1)
        beta[n] = 0.0
        for j in range(n - 1, -1, -1):
            terms = []
            for i in range(j + 1, min(j + L, n) + 1):
                lp = logp.get(w[j:i])
                if lp is not None and beta[i] != _NEG_INF:
                    terms.append(lp + beta[i])
            if terms:
                beta[j] = _logsumexp(terms)
        for j in range(n):
            if alpha[j] == _NEG_INF:
                continue
            for i in range(j + 1, min(j + L, n) + 1):
                lp = logp.get(w[j:i])
                if lp is None or beta[i] == _NEG_INF:
                    continue
                post = math.exp(alpha[j] + lp + beta[i] - z)
                exp_counts[w[j:i]] += post * c
        loglik += z * c
    return exp_counts, loglik


def _renormalize(exp_counts: dict[str, float]) -> dict[str, float]:
    total = sum(exp_counts.values())
    if total <= 0.0:
        raise ValueError("EM collapsed: zero total expected count")
    logt = math.log(total)
    out = {}
    for p in sorted(exp_counts):
        c = exp_counts[p]
        # a piece no segmentation used keeps a floor instead of -inf
        out[p] = math.log(c) - logt if c > 0.0 else -1e9
    return out


def train_unigram_from_hist(
    hist: dict[str, int],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink: float = 0.75,
    unk_logp: float = -20.0,
) -> UnigramModel:
    """The pure-Python trainer over a word histogram — the REFERENCE
    implementation. :func:`learn_unigram` is exactly this function fed
    by the distributed histogram, so Spark and reference are bit-equal
    whenever the histograms agree (pinned in tests/test_unigram.py)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if max_piece_len < 1:
        raise ValueError(
            f"max_piece_len must be >= 1, got {max_piece_len}"
        )
    if not 0.0 < shrink < 1.0:
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if not hist:
        return UnigramModel(
            logp={}, max_piece_len=max_piece_len, unk_logp=unk_logp
        )
    # canonical word order: EM accumulates float expected counts by
    # iterating the histogram, so the SAME counts arriving in a
    # different dict order (distributed top-k vs a local Counter)
    # would drift in the last bits — sort once, bit-equality follows
    hist = dict(sorted(hist.items()))
    if seed_size is None:
        seed_size = max(vocab_size * 8, vocab_size + 1)
    logp = _seed_pieces(hist, max_piece_len, seed_size)

    def run_em(lp: dict[str, float]) -> tuple[dict[str, float], dict]:
        counts: dict[str, float] = {}
        for _ in range(max(em_iters, 1)):
            counts, _ll = _em_step(hist, lp, max_piece_len)
            lp = _renormalize(counts)
        return lp, counts

    logp, counts = run_em(logp)
    while len(logp) > vocab_size:
        singles = {p for p in logp if len(p) == 1}
        target = max(vocab_size, int(len(logp) * shrink))
        multis = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-counts.get(p, 0.0), p),
        )
        keep = singles | set(multis[: max(target - len(singles), 0)])
        if len(keep) >= len(logp):
            break  # nothing prunable beyond the single-char floor
        logp = {p: logp[p] for p in sorted(keep)}
        logp, counts = run_em(logp)
    return UnigramModel(
        logp=logp, max_piece_len=max_piece_len, unk_logp=unk_logp
    )


def learn_unigram(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_words: int = 100_000,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> UnigramModel:
    """Learn a unigram-LM piece vocabulary from the corpus: one
    distributed word-histogram aggregation, then the driver-side EM
    (:func:`train_unigram_from_hist`) over it."""
    hist = word_histogram(docs, text_col, max_words)
    return train_unigram_from_hist(
        hist,
        vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        em_iters=em_iters,
        shrink=shrink,
    )


def unigram_encode(word: str, model: UnigramModel) -> list[str]:
    """Viterbi segmentation: maximize the total log-prob; ties prefer
    FEWER pieces, then the longer final piece (deterministic). Unseen
    characters fall back to single-char pieces at ``unk_logp`` —
    encoding never fails and never loses characters."""
    n = len(word)
    if n == 0:
        return []
    L = model.max_piece_len
    lp = model.logp
    # DP value: (score, -n_pieces); back[i] = start of the piece
    # ending at i under the best value
    best: list[tuple[float, int]] = [(_NEG_INF, 0)] * (n + 1)
    best[0] = (0.0, 0)
    back = [-1] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - L), i):
            if best[j][0] == _NEG_INF:
                continue
            piece = word[j:i]
            p = lp.get(piece)
            if p is None:
                if len(piece) != 1:
                    continue
                p = model.unk_logp  # single-char fallback
            cand = (best[j][0] + p, best[j][1] - 1)
            # strict improvement, or same (score, pieces) with an
            # earlier j (longer final piece) — j ascends, so the
            # FIRST equal candidate wins: keep on strict > only
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def unigram_token_counts(
    docs: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    out_col: str = "n_unigram_tokens",
) -> DataFrame:
    """→ input columns plus ``out_col``: the exact piece count of each
    document under the model — the unigram twin of
    functions/bpe.bpe_token_counts, and an equally valid token budget
    for operators/packing. Arrow-batched; per-batch word cache."""
    if out_col in docs.columns:
        raise ValueError(
            f"output column {out_col!r} already exists; pass out_col="
        )

    @F.pandas_udf(LongType())
    def n_pieces(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(text: str) -> int:
            if text is None:
                return 0
            total = 0
            for w in split_words(text):
                n = cache.get(w)
                if n is None:
                    n = len(unigram_encode(w, model))
                    cache[w] = n
                total += n
            return total

        return texts.map(count)

    return docs.withColumn(out_col, n_pieces(F.col(text_col)))


def unigram_tokens_df(
    docs: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, unigram_tokens array<string>)`` — the full piece
    sequence, for vocabulary audits and round-trip tests."""
    out_schema = StructType(
        [
            StructField("doc_id", docs.schema[id_col].dataType),
            StructField("unigram_tokens", ArrayType(StringType())),
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
                            enc = unigram_encode(w, model)
                            cache[w] = enc
                        pieces.extend(enc)
                toks.append(pieces)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "unigram_tokens": toks}
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, schema=out_schema
    )
