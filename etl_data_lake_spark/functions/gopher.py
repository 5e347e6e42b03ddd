"""The complete Gopher quality-rule set (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
Table A1) — the named public document-level filter most pretraining
pipelines (MassiveText, RefinedWeb, Dolma) apply verbatim or nearly
so. The repo's earlier heuristics (text_quality_scores,
repetition_signals) cover adjacent signals; this module implements the
PAPER's seven rules exactly, as one codegen'd projection + one filter:

1. word count in [min_words, max_words]            (paper: 50–100 000)
2. mean word length in [min/max_mean_word_chars]   (paper: 3–10)
3. symbol-to-word ratio ≤ max_symbol_word_ratio
   for EITHER symbol family separately — '#' chars
   per word, and '…'/'...' occurrences per word
   (paper: 0.1 "for either the hash symbol or the
   ellipsis"; a round-12 draft pooled the two into
   one ratio, which is strictly stricter than the
   paper — round-13 advice fix)
4. fraction of lines starting with a bullet
   ≤ max_bullet_line_frac                          (paper: 0.9)
5. fraction of lines ending with an ellipsis
   ≤ max_ellipsis_line_frac                        (paper: 0.3)
6. fraction of words containing ≥ 1 alphabetic
   character ≥ min_alpha_word_frac                 (paper: 0.8)
7. ≥ min_stop_hits DISTINCT members of the paper's
   8-word stop set present                         (paper: 2)

Everything is JVM expressions over two splits (words, lines) — no
UDF, no shuffle; at 100 TB this runs at scan speed and composes with
predicate pushdown. Signals and filter are split so a pipeline can
audit the per-rule columns (the Dolma "taggers then mixers" shape)
before committing to the drop. DuckDB twins for every signal live in
:func:`sql_gopher_signals` (parity-checked in test_parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
_BULLET_RE = r"^[•‣▪◦*-]"
_ELLIPSIS_RE = r"(\.\.\.|…)$"


def _words(text: Column) -> Column:
    from etl_data_lake_spark.functions.text import nonempty_tokens

    return nonempty_tokens(text)


def _lines(text: Column) -> Column:
    # lambda, not bare F.trim: transform passes the element INDEX as a
    # second arg to binary callables, which would silently become
    # trim's deprecated trim-string parameter.
    # split on \r?\n (round-12 review fix): a CRLF corpus would leave
    # \r on every line, where Java's '$' matches BEFORE the trailing
    # terminator but RE2/DuckDB's does not — the twin would diverge
    # on the first Windows-lineage document.
    return F.filter(
        F.transform(F.split(text, r"\r?\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den.cast("double")).otherwise(F.lit(0.0))


def _signal_exprs(text_col: str) -> dict[str, Column]:
    """The seven rule inputs as per-row Columns — shared by the signal
    projection and the filter so thresholds always apply to the SAME
    (rounded) values."""
    text = F.col(text_col)
    words = _words(text)
    lines = _lines(text)
    nw = F.size(words)
    nl = F.size(lines)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    hash_chars = F.length(text) - F.length(F.replace(text, F.lit("#")))
    ell3 = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / F.lit(3)
    ell1 = F.length(text) - F.length(F.replace(text, F.lit("…")))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE)))
    n_ellipsis_end = F.size(
        F.filter(lines, lambda l: l.rlike(_ELLIPSIS_RE))
    )
    n_alpha = F.size(F.filter(words, lambda t: t.rlike("[A-Za-z]")))
    # distinct stop-set hits as ONE set intersection (array_intersect
    # dedups) — same semantics as the 8 array_contains probes it
    # replaces, smaller expression tree (round-12 verdict item #8)
    n_stop = F.size(
        F.array_intersect(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]), words
        )
    )
    return {
        "n_words": nw.cast("long"),
        "mean_word_chars": F.round(_frac(total_chars, nw), 6),
        "hash_word_ratio": F.round(_frac(hash_chars, nw), 6),
        "ellipsis_word_ratio": F.round(_frac(ell3 + ell1, nw), 6),
        "bullet_line_frac": F.round(_frac(n_bullet, nl), 6),
        "ellipsis_line_frac": F.round(_frac(n_ellipsis_end, nl), 6),
        "alpha_word_frac": F.round(_frac(n_alpha, nw), 6),
        "n_stop_hits": n_stop.cast("long"),
    }


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ one row per input row: (id_col, n_words, mean_word_chars,
    hash_word_ratio, ellipsis_word_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_stop_hits) — the seven
    rules' inputs (rule 3 reports its two symbol families separately,
    as the paper thresholds them), rounded to
    6 dp where fractional (cross-engine float hygiene). Empty/blank
    documents report 0 everywhere (they fail rule 1 anyway)."""
    sig = _signal_exprs(text_col)
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in sig.items()]
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_chars: float = 3.0,
    max_mean_word_chars: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Rows passing ALL seven Gopher rules (paper defaults;
    ``max_symbol_word_ratio`` bounds the hash and ellipsis ratios
    EACH, per the paper's "either" wording) — ONE
    in-place ``where`` over the per-row signal expressions: kept rows
    carry every input column byte-for-byte, the scan is the only work
    (no join, no shuffle — an earlier draft semi-joined the signal
    projection back, paying a second scan plus an exchange for
    nothing), and because it is a stateless row predicate the same
    call works unchanged on a STREAMING frame (the gate shape:
    readStream → gopher_filter → sink). Thresholds apply to the same
    rounded values gopher_signals emits — one shared expression
    set."""
    sig = _signal_exprs(text_col)
    return df.where(
        sig["n_words"].between(min_words, max_words)
        & sig["mean_word_chars"].between(
            min_mean_word_chars, max_mean_word_chars
        )
        & (sig["hash_word_ratio"] <= max_symbol_word_ratio)
        & (sig["ellipsis_word_ratio"] <= max_symbol_word_ratio)
        & (sig["bullet_line_frac"] <= max_bullet_line_frac)
        & (sig["ellipsis_line_frac"] <= max_ellipsis_line_frac)
        & (sig["alpha_word_frac"] >= min_alpha_word_frac)
        & (sig["n_stop_hits"] >= min_stop_hits)
    )


# ---------------------------------------------------------------------------
# DuckDB twin — every signal as portable SQL over the same splits.
# ---------------------------------------------------------------------------


def sql_gopher_signals(table: str = "documents") -> str:
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> t != '') AS words,
                   list_filter(list_transform(
                                   regexp_split_to_array(text, '\\r?\\n'),
                                   l -> trim(l)),
                               l -> l != '') AS lines,
                   length(text)
                       - length(replace(text, '#', '')) AS hash_chars,
                   (length(text)
                       - length(replace(text, '...', ''))) / 3 AS ell3,
                   length(text)
                       - length(replace(text, '…', '')) AS ell1
            FROM {table}
        )
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               ROUND(CASE WHEN len(words) > 0
                   THEN list_aggregate(
                            list_transform(words, t -> length(t)), 'sum')
                        / CAST(len(words) AS DOUBLE)
                   ELSE 0.0 END, 6) AS mean_word_chars,
               ROUND(CASE WHEN len(words) > 0
                   THEN hash_chars / CAST(len(words) AS DOUBLE)
                   ELSE 0.0 END, 6) AS hash_word_ratio,
               ROUND(CASE WHEN len(words) > 0
                   THEN (ell3 + ell1) / CAST(len(words) AS DOUBLE)
                   ELSE 0.0 END, 6) AS ellipsis_word_ratio,
               ROUND(CASE WHEN len(lines) > 0
                   THEN len(list_filter(lines,
                            l -> regexp_matches(l, '{_BULLET_RE}')))
                        / CAST(len(lines) AS DOUBLE)
                   ELSE 0.0 END, 6) AS bullet_line_frac,
               ROUND(CASE WHEN len(lines) > 0
                   THEN len(list_filter(lines,
                            l -> regexp_matches(l, '{_ELLIPSIS_RE}')))
                        / CAST(len(lines) AS DOUBLE)
                   ELSE 0.0 END, 6) AS ellipsis_line_frac,
               ROUND(CASE WHEN len(words) > 0
                   THEN len(list_filter(words,
                            t -> regexp_matches(t, '[A-Za-z]')))
                        / CAST(len(words) AS DOUBLE)
                   ELSE 0.0 END, 6) AS alpha_word_frac,
               CAST(len(list_filter([{stops}],
                        s -> list_contains(words, s))) AS BIGINT)
                   AS n_stop_hits
        FROM base
    """
