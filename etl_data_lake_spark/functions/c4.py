"""C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning…", §2.2) — the other canonical named public
cleanup besides the Gopher rules: line-level retention followed by
page-level drops. The paper's rules, implemented verbatim where they
are string-expressible:

line stage (:func:`c4_clean_lines`):
* keep only lines ending in a terminal punctuation mark
  (``. ! ? "`` or a closing curly quote);
* keep only lines with ≥ ``min_words_per_line`` words (paper: 5);
* drop any line containing the word "javascript" (case-insensitive,
  word-bounded — the paper's cookie-banner heuristic).

page stage (:func:`c4_page_filter`):
* drop pages whose ORIGINAL text contains a curly bracket (code) or
  the phrase "lorem ipsum" (template filler) — checked pre-cleaning
  on purpose: a page that ever carried ``{`` is code regardless of
  which lines survive;
* drop pages whose CLEANED text has fewer than ``min_sentences``
  terminal punctuation marks (paper: 3 sentences) — counted after
  line cleaning, since that is the text that would ship; the count
  uses C4's OWN terminal set (round 13: Latin ``.!?`` plus the
  CJK/fullwidth ``。．！？`` so Chinese/Japanese sentences count
  toward the floor — but NOT the ellipsis ``…``, which
  functions/sentences.py's segmentation terminates on; see the
  comment at ``_C4_TERMINALS``);
* optional ``ban_words``: the paper's bad-words list is data, not
  code — pass it at deploy time; whole-word, case-insensitive,
  page-level.

(The paper's remaining step — three-sentence-span dedup across pages
— is exact-substring dedup's job: dedup/substring.py.)

Everything is higher-order array expressions + regexes over two
splits: zero UDFs, zero shuffles — scan speed at 100 TB, and the
output text column composes with downstream Arrow stages (pinned by
test; the round-3/4 projection-collapse trap does not reproduce on
Spark 4.1's UDF extraction, and the test will catch it if it
returns)."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The paper's line-terminal set is English C4's: terminal punctuation
# or an END QUOTATION MARK ('. ! ? "'). Round 13 extends both halves
# with the CJK/fullwidth terminators 。．！？ and the CJK end quotes
# 」』, so a Chinese/Japanese line is not structurally un-keepable —
# a deliberate, documented deviation that IS a no-op on English pages
# because the added characters do not occur in English typography.
# The horizontal ellipsis '…' is deliberately EXCLUDED (review fix):
# it is common in English ('Read more…' teaser lines are exactly the
# truncated boilerplate this rule exists to drop, and the paper's own
# rule drops them), so sentences.py's segmentation set — which does
# terminate on '…' — is the wrong set for C4's keep/drop policy.
_C4_TERMINALS = ".!?。．！？"
TERMINAL_RE = f'[{_C4_TERMINALS}"”」』]\\s*$'
# the sentence-floor COUNT uses the same C4-specific set
TERMINATOR_CLASS = f"[{_C4_TERMINALS}]"
_JS_RE = r"(?i)\bjavascript\b"


def _ban_regex(word: str) -> str:
    """Case-insensitive pattern for one ban-list entry with every
    regex metacharacter escaped (round-12 review fix: the public bad-
    words lists carry entries like ``a$$`` — an unescaped ``$``
    anchors and the entry silently never matches; an unbalanced
    ``(`` kills the scan). Word boundaries apply only where the
    entry's edge is a word character — ``\\b`` next to punctuation
    would demand a boundary that plain text rarely provides."""
    import re as _re

    w = str(word).lower()
    if not w:
        raise ValueError("empty ban_words entry")
    pre = r"\b" if (w[0].isalnum() or w[0] == "_") else ""
    suf = r"\b" if (w[-1].isalnum() or w[-1] == "_") else ""
    return f"(?i){pre}{_re.escape(w)}{suf}"


def _word_count(line: Column) -> Column:
    from etl_data_lake_spark.functions.text import nonempty_tokens

    return F.size(nonempty_tokens(line))


def _kept_lines(text: Column, min_words_per_line: int) -> Column:
    # \r?\n: a CRLF corpus must not leave \r glued to every line
    return F.filter(
        F.split(text, r"\r?\n"),
        lambda l: l.rlike(TERMINAL_RE)
        & (_word_count(l) >= min_words_per_line)
        & ~l.rlike(_JS_RE),
    )


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
) -> DataFrame:
    """``df`` with ``text_col`` rebuilt from the retained lines
    (joined by newlines; all other columns untouched). A page whose
    every line fails becomes the empty string — the page stage drops
    it via the sentence floor."""
    kept = F.array_join(
        _kept_lines(F.col(text_col), min_words_per_line), "\n"
    )
    return df.select(
        *[
            kept.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )


def c4_page_filter(
    df: DataFrame,
    text_col: str = "text",
    min_sentences: int = 3,
    min_words_per_line: int = 5,
    ban_words: Iterable[str] = (),
) -> DataFrame:
    """Page-level predicate over the ORIGINAL text (markers) and the
    would-be-cleaned text (sentence floor): rows that survive C4's
    page drops. Returns input rows unchanged — compose with
    :func:`c4_clean_lines` (or use :func:`c4_clean`)."""
    text = F.col(text_col)
    cond = _page_cond(text, min_sentences, min_words_per_line, ban_words)
    return df.where(cond)


def _page_cond(text, min_sentences, min_words_per_line, ban_words):
    low = F.lower(text)
    cond = (
        text.isNotNull()
        & ~text.contains("{")
        & ~low.contains("lorem ipsum")
    )
    for w in ban_words:
        cond = cond & ~text.rlike(_ban_regex(w))
    cleaned = F.array_join(
        _kept_lines(text, min_words_per_line), "\n"
    )
    return cond & (
        F.regexp_count(cleaned, F.lit(TERMINATOR_CLASS)) >= min_sentences
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_sentences: int = 3,
    min_words_per_line: int = 5,
    ban_words: Iterable[str] = (),
) -> DataFrame:
    """The full C4 cleanup: page filter, then line rebuild — surviving
    rows carry only their retained lines, every other column
    byte-for-byte. Single-pass (round-12 review fix): the kept-lines
    array materializes ONCE as a projected column below the filter —
    composing c4_page_filter ∘ c4_clean_lines would evaluate the whole
    split+regex+word-count pipeline twice per surviving page, doubling
    the dominant cost of a scan-speed stage."""
    if "__c4_lines" in df.columns:
        raise ValueError("'__c4_lines' is reserved by c4_clean — rename")
    text = F.col(text_col)
    staged = df.withColumn(
        "__c4_lines", _kept_lines(text, min_words_per_line)
    )
    low = F.lower(text)
    cond = (
        text.isNotNull()
        & ~text.contains("{")
        & ~low.contains("lorem ipsum")
    )
    for w in ban_words:
        cond = cond & ~text.rlike(_ban_regex(w))
    cond = cond & (
        F.regexp_count(
            F.array_join("__c4_lines", "\n"), F.lit(TERMINATOR_CLASS)
        )
        >= min_sentences
    )
    kept = F.array_join("__c4_lines", "\n")
    return staged.where(cond).select(
        *[
            kept.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )
