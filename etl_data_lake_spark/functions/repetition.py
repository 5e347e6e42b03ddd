"""Repetition signals — the Gopher-style quality heuristics that
catch boilerplate and degenerate generation loops (Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 repetition filters).

Highly repetitive documents (scraped boilerplate, SEO spam, template
pages) poison language-model training even when every individual
line looks fine, so curation pipelines filter on within-document
repetition fractions. Three signals per document:

* ``dup_line_fraction`` — fraction of non-empty lines that are
  repeats of an earlier line;
* ``dup_paragraph_fraction`` — same at blank-line-separated
  paragraph granularity;
* ``top_word_char_fraction`` — fraction of word characters taken by
  the single most frequent word (degenerate loops push this to ~1).

Scale shape: the line/paragraph signals are pure per-row array
expressions (split / array_distinct / size — whole-stage codegen, no
shuffle, NO lambda higher-order functions: those would break any
downstream Arrow-batched consumer through Catalyst's projection
collapse, the round-4 trap recorded in ROUND_NOTES). The top-word
signal is one explode + two hash aggregations keyed by doc — the
same map-side-combinable shape as token counting, linear in corpus
size and skew-free (keys are (doc_id, token))."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _frac_dup(arr) -> F.Column:
    """1 - distinct/size over a possibly-empty array column."""
    n = F.size(arr)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(arr)) / n.cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ one row per input row: (id_col, dup_line_fraction,
    dup_paragraph_fraction, top_word_char_fraction), all in [0, 1]."""
    text = F.col(text_col)
    # paragraphs: blank-line-separated blocks of the ORIGINAL text;
    # lines: newline-runs collapsed first so empty lines don't count
    paras = F.split(F.regexp_replace(text, r"(^\n+|\n+$)", ""), r"\n{2,}")
    lines = F.split(
        F.regexp_replace(F.regexp_replace(text, r"\n+", "\n"),
                         r"(^\n|\n$)", ""),
        r"\n",
    )
    per_doc = df.select(
        F.col(id_col),
        _frac_dup(lines).alias("dup_line_fraction"),
        _frac_dup(paras).alias("dup_paragraph_fraction"),
    )

    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(text), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    word_chars = (
        toks.groupBy(id_col, "tok")
        .agg((F.count("*") * F.length("tok")).alias("chars"),
             F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            (
                F.max_by("chars", F.struct("cnt", "tok")).cast("double")
                / F.sum("chars").cast("double")
            ).alias("top_word_char_fraction")
        )
    )
    # left join: a whitespace-only doc has no tokens -> fraction 0
    return per_doc.join(word_chars, on=id_col, how="left").select(
        id_col,
        "dup_line_fraction",
        "dup_paragraph_fraction",
        F.coalesce("top_word_char_fraction", F.lit(0.0)).alias(
            "top_word_char_fraction"
        ),
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_fraction: float = 0.30,
    max_dup_paragraph_fraction: float = 0.30,
    max_top_word_char_fraction: float = 0.20,
) -> DataFrame:
    """Rows of ``df`` whose repetition signals pass the (Gopher-
    default-shaped) thresholds — the drop-in curation stage."""
    sig = repetition_signals(df, id_col, text_col)
    keep = sig.where(
        (F.col("dup_line_fraction") <= max_dup_line_fraction)
        & (F.col("dup_paragraph_fraction") <= max_dup_paragraph_fraction)
        & (F.col("top_word_char_fraction") <= max_top_word_char_fraction)
    ).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")


def compression_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """→ (id_col, raw_bytes, compressed_bytes, compression_ratio):
    per-document DEFLATE compression ratio (compressed/raw of the
    UTF-8 text) — the standard cheap gibberish-vs-repetition signal
    public corpus pipelines threshold on BOTH sides (Dolma/RedPajama
    lineage): highly repetitive text compresses far below normal prose
    (ratio ≲ 0.3 → templated/looped junk), while random-looking bytes
    don't compress at all (ratio ≳ 1.0 → binary spill, DNA-style
    strings, encrypted blobs).

    This is the one quality signal here that is INHERENTLY a codec
    call, so it runs as an Arrow-batched pandas UDF (zlib level
    ``level``, the DEFLATE default 6) — per-row Python cost is the
    compressor itself, which no JVM expression replaces. Empty
    documents report ratio 0.0 (nothing to judge — callers gate on
    length separately) while ``compressed_bytes`` is still the TRUE
    zlib output size (8 bytes of header/trailer for ``b""`` — the
    column is always a measurement, never an invented number; round-12
    fix of a round-11 ADVICE finding). Deterministic: zlib output for
    a fixed level is stable across runs and platforms."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    if not 1 <= level <= 9:
        raise ValueError(f"level must be in 1..9, got {level}")

    @pandas_udf("long")
    def gz_size(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                len(zlib.compress(t.encode("utf-8"), level))
                for t in texts.fillna("")
            ]
        )

    # raw size is a JVM expression; only the compressor call is Python
    out = df.select(
        F.col(id_col),
        F.coalesce(
            F.octet_length(F.col(text_col)), F.lit(0)
        ).cast("long").alias("raw_bytes"),
        gz_size(F.col(text_col)).alias("compressed_bytes"),
    )
    return out.select(
        id_col,
        "raw_bytes",
        "compressed_bytes",
        F.round(
            F.when(
                F.col("raw_bytes") > 0,
                F.col("compressed_bytes")
                / F.col("raw_bytes").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("compression_ratio"),
    )


def compression_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = 0.25,
    max_ratio: float = 0.95,
    level: int = 6,
) -> DataFrame:
    """Rows whose compression ratio sits in the healthy-prose band —
    the two-sided drop-in curation stage (below ``min_ratio`` =
    repetitive junk, above ``max_ratio`` = incompressible noise).
    Empty documents (ratio 0.0) drop with the repetitive band."""
    if not 0.0 <= min_ratio < max_ratio:
        raise ValueError(
            f"need 0 <= min_ratio < max_ratio, got [{min_ratio}, {max_ratio}]"
        )
    sig = compression_signals(df, id_col, text_col, level)
    keep = sig.where(
        (F.col("raw_bytes") > 0)  # empty docs ALWAYS drop, even at
        # min_ratio=0.0 — the documented contract, not a band artifact
        & (F.col("compression_ratio") >= min_ratio)
        & (F.col("compression_ratio") <= max_ratio)
    ).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")
