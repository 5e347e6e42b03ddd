"""Sentence segmentation + sentence-aware chunking (round 12, late).

The step between a cleaned corpus and a context-window-bounded
consumer when CHARACTER chunking (operators/chunking.py) would shear
mid-sentence: split on terminal punctuation, then greedily pack
consecutive sentences into budget-bounded chunks. RAG indexing and
pretraining sequence prep both want this shape; C4's "three-sentence
floor" and the contamination family's span semantics already treat
the sentence as a unit — this makes it a first-class column.

Segmentation is the DETERMINISTIC regex rule, stated plainly: a
sentence is a maximal run ending in one or more terminators plus any
closing quotes/brackets, or the terminator-less tail. Script
coverage (round-13 verdict item #4): the terminator set spans Latin
``.!?``, the horizontal ellipsis ``…``, and the CJK/fullwidth
terminals ``。．！？``; the closing-punctuation set spans ASCII
quotes/brackets, curly quotes, and the ideographic closers
``」』）〉》】〕``. Scripts without terminal punctuation marks (Thai,
Lao, Khmer running text) segment as ONE sentence per document — a
language-specific model belongs upstream, not here. No abbreviation
model either — "Dr. Smith" splits after "Dr." — because a model
would be a language-specific artifact; what matters at corpus scale
is that the rule is total (every character lands in exactly one
sentence — reconstruction is exact modulo the whitespace BETWEEN
sentences, test-pinned) and cheap (one JVM ``regexp_extract_all``,
no UDF, no shuffle).

Chunking is one higher-order ``aggregate`` fold over the sentence
array — still per-row, still zero-shuffle: sentences append to the
current chunk while it stays within ``max_chars`` (joined by a single
space, the normalization the whitespace-tokenizing pipeline already
assumes); a sentence that cannot fit starts a new chunk, and a single
sentence LONGER than the budget becomes its own oversized chunk (the
loud alternative — splitting it mid-token — belongs to
operators/chunking, which composes downstream if hard caps are
required).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Latin + fullwidth/CJK sentence terminators (。U+3002, ．U+FF0E,
# ！U+FF01, ？U+FF1F, …U+2026). This is the SEGMENTATION set — the
# ellipsis terminates a sentence here because a trailing-off clause
# is a unit for chunking. functions/c4.py keeps its own terminal set
# WITHOUT '…' (the paper's keep/drop policy treats '…'-ended lines
# as truncated boilerplate) — the two rules serve different policies
# and are deliberately not shared.
TERMINATORS = ".!?。．！？…"
# closing quotes/brackets that bind to the preceding terminator:
# ASCII + curly + CJK corner brackets / fullwidth closers
_CLOSERS = "\"'”’)\\]」』）〉》】〕"
TERMINATOR_CLASS = f"[{TERMINATORS}]"

# maximal terminator-ended run | terminator-less tail
SENTENCE_RE = (
    f"[^{TERMINATORS}]*[{TERMINATORS}]+[{_CLOSERS}]*"
    f"|[^{TERMINATORS}]+$"
)


def sentence_array(text: str | Column) -> Column:
    """array<string>: trimmed, non-empty sentences of ``text`` in
    order (null text → null, the Spark convention)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(
            F.regexp_extract_all(c, F.lit(SENTENCE_RE), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, sentence_idx, sentence): one row per sentence,
    0-indexed in document order. posexplode of one extract-all — a
    per-row flatMap, the output inherits the input partitioning."""
    return df.select(
        F.col(id_col),
        F.posexplode(sentence_array(text_col)).alias(
            "sentence_idx", "sentence"
        ),
    )


def chunk_by_sentences(
    df: DataFrame,
    max_chars: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, chunk_idx, chunk, n_sentences): consecutive
    sentences greedily packed into chunks of at most ``max_chars``
    characters (single oversized sentences excepted — see module
    docstring). Everything is one aggregate fold per row: no Python,
    no shuffle, and document order is preserved within and across
    chunks."""
    if max_chars < 1:
        raise ValueError(f"max_chars must be >= 1, got {max_chars}")
    sents = sentence_array(text_col)
    empty_chunks = F.array().cast("array<struct<chunk:string,n:int>>")
    acc0 = F.struct(
        empty_chunks.alias("done"),
        F.lit("").alias("cur"),
        F.lit(0).alias("n"),
    )

    def step(acc, s):
        joined = F.concat(acc["cur"], F.lit(" "), s)
        fits = (
            F.length(acc["cur"]) + F.length(s) + F.lit(1)
            <= F.lit(max_chars)
        ) & (acc["n"] > 0)
        fresh_done = F.concat(
            acc["done"],
            F.array(
                F.struct(
                    acc["cur"].alias("chunk"), acc["n"].alias("n")
                )
            ),
        )
        return F.struct(
            F.when(fits | (acc["n"] == 0), acc["done"])
            .otherwise(fresh_done)
            .alias("done"),
            F.when(acc["n"] == 0, s)
            .when(fits, joined)
            .otherwise(s)
            .alias("cur"),
            F.when(acc["n"] == 0, F.lit(1))
            .when(fits, acc["n"] + 1)
            .otherwise(F.lit(1))
            .alias("n"),
        )

    def finish(acc):
        return F.when(acc["n"] > 0, F.concat(
            acc["done"],
            F.array(
                F.struct(acc["cur"].alias("chunk"), acc["n"].alias("n"))
            ),
        )).otherwise(acc["done"])

    chunks = F.aggregate(sents, acc0, step, finish)
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_c"),
    ).select(
        id_col,
        "chunk_idx",
        F.col("_c.chunk").alias("chunk"),
        F.col("_c.n").cast("long").alias("n_sentences"),
    )
