"""Text normalization — the unicode/markup cleanup pass between raw
crawl text and every downstream text operator (shingles, token counts,
LM scoring, dedup hashes all become more stable once curly quotes,
stray control bytes and HTML residue stop fragmenting otherwise-equal
strings).

One codegen'd ``regexp_replace``/``translate`` chain like
functions/redact.py — no UDF, no shuffle, runs at scan speed — with a
FIXED application order (tags strip before entities decode, so
``&lt;b&gt;`` decodes to a literal ``<b>`` within ONE pass; entities
decode before whitespace collapses, so ``&nbsp;`` participates in the
collapse). Re-normalizing cleaned text is a no-op (test-pinned) with
one documented exception shared by every entity decoder: each pass
decodes entities exactly ONE level, so text still containing entity
strings after a pass (entity-encoded entities like ``&amp;lt;``, or
decoded tag-shaped text like ``&lt;tag&gt;`` → ``<tag>`` which a
second pass re-strips) changes again — the classic double-unescape
hazard; normalize once per ingest, or disable ``strip_html`` on
re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unicode punctuation → ASCII (translate: 1:1 codepoint map, one pass)
_PUNCT_FROM = "‘’‚‛“”„–—―"
_PUNCT_TO = "''''\"\"\"---"
# unicode space family (NBSP, ogham, en/em/thin/zero-width, narrow
# no-break, medium math, ideographic)
_USPACE_RE = "[\\u00a0\\u1680\\u2000-\\u200b\\u202f\\u205f\\u3000]"

# &amp; decodes LAST: decoding it first would let "&amp;lt;" (an
# entity-encoded entity, meaning literal "&lt;") double-unescape to
# "<" within one pass
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def normalize_text(
    col: str | Column,
    strip_html: bool = True,
    punct: bool = True,
    controls: bool = True,
    whitespace: bool = True,
) -> Column:
    """→ the normalized string Column. Stages (fixed order):

    1. ``strip_html``: drop ``<...>`` tags (non-greedy, no nesting —
       the crawl-residue case, not an HTML parser), then decode the
       common entities.
    2. ``punct``: smart quotes → straight, en/em/horizontal dashes →
       ``-``, ellipsis → ``...``, unicode spaces → ASCII space.
    3. ``controls``: strip C0/C1 control characters except ``\\n`` and
       ``\\t``.
    4. ``whitespace``: collapse runs of spaces/tabs to one space, trim
       each line's edges, collapse 3+ newlines to 2 (paragraph
       structure survives; intra-line spacing noise does not).
    """
    c = F.col(col) if isinstance(col, str) else col
    if strip_html:
        # TAG-SHAPED spans only (</?letter...> plus comments): a bare
        # "<[^<>]*>" would eat plain-text comparison operators —
        # "for i < n and j > 0" lost "< n and j >" (review regression)
        c = F.regexp_replace(c, r"<!--.*?-->", "")
        c = F.regexp_replace(c, r"</?[a-zA-Z][^<>]*>", "")
        for ent, rep in _ENTITIES:
            c = F.regexp_replace(c, ent, rep)
    if punct:
        c = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
        c = F.regexp_replace(c, "…", "...")
        c = F.regexp_replace(c, _USPACE_RE, " ")
    if controls:
        c = F.regexp_replace(c, r"[\x00-\x08\x0b-\x1f\x7f\x80-\x9f]", "")
    if whitespace:
        c = F.regexp_replace(c, r"[ \t]+", " ")
        c = F.regexp_replace(c, r" ?\n ?", "\n")
        c = F.regexp_replace(c, r"\n{3,}", "\n\n")
        c = F.regexp_replace(c, r"^\s+|\s+$", "")
    return c


def normalize_docs(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Apply :func:`normalize_text` to a corpus column (in place by
    default). Null text stays null."""
    return df.withColumn(out_col or text_col, normalize_text(text_col))
