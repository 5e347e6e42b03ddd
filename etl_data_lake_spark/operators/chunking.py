"""Document chunking — split long documents into bounded-size pieces
with optional overlap, the step between a curated corpus and a
context-window-bounded consumer (pretraining sequence prep, RAG
indexing, embedding batches).

Pure JVM codegen: ``sequence`` generates each document's chunk start
offsets, ``explode`` fans them out, ``substring`` slices — no Python
in the hot path, no shuffle at all (chunking is a per-row flatMap; the
output inherits the input's partitioning). At 100 TB this runs at
scan speed and the only growth is the overlap factor.

Sizes are in CHARACTERS (the unit the engine can slice JVM-side);
token-budgeted packing of the resulting chunks is operators/packing's
job, and the two compose: chunk to ~4x the token budget in chars,
then pack exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_ID_COL = "chunk_idx"


def chunk_documents(
    df: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ one row per chunk: every input column except ``text_col``,
    plus ``chunk_idx`` (0-based, contiguous per document) and the
    chunked ``text_col``. Chunks step by ``chunk_chars - overlap`` so
    consecutive chunks share ``overlap`` characters; every chunk is
    ≤ ``chunk_chars`` and non-empty; a document shorter than one
    chunk yields exactly itself as chunk 0. Null/empty documents
    yield no chunks (there is nothing to train on or index).

    Deterministic and layout-invariant: chunk boundaries are a pure
    function of the text length, so re-chunking after any repartition
    or retry reproduces identical (doc, chunk_idx, text) rows."""
    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"overlap must be in [0, chunk_chars), got {overlap}"
        )
    clash = {CHUNK_ID_COL, "__i", "__t"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has column(s) {sorted(clash)}")
    step = chunk_chars - overlap
    text = F.col(text_col)
    n = F.length(text)
    # chunk indices 0..ceil((len-chunk)/step), computed as
    # floor(max(len-overlap-1, 0)/step): chunk i is emitted only when
    # it extends PAST chunk i-1's end — with overlap, a final partial
    # chunk shorter than the overlap is already fully contained in
    # the previous chunk (len=10, chunk=8, overlap=4 would otherwise
    # emit chars 9-10, a substring of chunk 1's 5-10) and must not
    # spawn a duplicate-content row; an exact multiple likewise does
    # NOT spawn a trailing empty chunk. Coverage holds: the last
    # chunk's end = last*step + chunk >= len.
    last = F.floor(
        F.greatest(n - F.lit(overlap + 1), F.lit(0)) / F.lit(step)
    ).cast("int")
    keep = [c for c in df.columns if c != text_col]
    return (
        df.where(text.isNotNull() & (n > 0))
        .select(
            *keep,
            F.explode(F.sequence(F.lit(0), last)).alias("__i"),
            text.alias("__t"),
        )
        .select(
            *keep,
            F.col("__i").cast("int").alias(CHUNK_ID_COL),
            F.substring(
                F.col("__t"),
                F.col("__i") * F.lit(step) + F.lit(1),
                F.lit(chunk_chars),
            ).alias(text_col),
        )
    )
