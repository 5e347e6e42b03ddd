"""PII redaction — scrub-before-train for text corpora.

A training-data pipeline must remove personally identifiable
information before a corpus ships; at 100 TB that scrubbing has to
run inside whole-stage codegen, not in a Python loop. Everything here
is a chain of JVM-side ``regexp_replace`` / ``regexp_count``
expressions over the text column — no UDFs, no shuffles, embarrassingly
parallel over whatever partitioning the corpus already has.

Patterns are deliberately CONSERVATIVE (precision over recall): a
false redaction destroys training text, while a rare miss is caught
by the audit stats (:func:`pii_stats` is the "how much PII per
source" report that decides which sources need stronger scrubbing).
Pattern set and placeholder format are parameters, so a deployment
can extend both; the defaults cover the classic machine-detectable
classes (emails, IPv4s, phone-shaped and long-id-shaped digit runs).

Order matters and is fixed: emails redact BEFORE phone/id digit runs
so an address like ``a123456789@b.com`` becomes one ``<EMAIL>``
rather than a digit-run hole inside an address; the composition test
pins this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# insertion order IS application order (see module docstring)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
    # phone shapes must carry an EXPLICIT phone marker — +country code,
    # (area) code, or the strict dashed 3-3-4 NANP form. A bare
    # "digit groups with separators" rule is how ISO dates
    # (2026-08-14), dotted dates (14.08.2026) and version strings
    # (10.15.70) get destroyed as <PHONE> across a whole corpus —
    # the precision-over-recall contract forbids exactly that, and
    # the date/version negatives are test-pinned.
    "phone": r"(?<![0-9A-Za-z.-])(?:"
             r"\+[0-9]{1,3}[ .-]?(?:\(?[0-9]{1,4}\)?[ .-]?){1,4}[0-9]{2,4}"
             r"|\([0-9]{2,4}\)[ .-]?[0-9]{3,4}[ .-]?[0-9]{3,4}"
             r"|[0-9]{3}-[0-9]{3}-[0-9]{4}"
             r")(?![0-9A-Za-z-])",
    # bare long digit runs (account / card / SSN-shaped), 9-19 digits
    "id_number": r"(?<![0-9A-Za-z.])[0-9]{9,19}(?![0-9A-Za-z.])",
}


def redact_text(
    col: Column | str,
    patterns: dict[str, str] | None = None,
    token_fmt: str = "<{kind}>",
) -> Column:
    """The text with every pattern class replaced by its placeholder
    (``<EMAIL>``, ``<IPV4>``, ...) — one codegen'd expression."""
    out = F.col(col) if isinstance(col, str) else col
    for kind, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(
            out, pat, token_fmt.format(kind=kind.upper())
        )
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token_fmt: str = "<{kind}>",
    keep_original: bool = False,
) -> DataFrame:
    """``df`` with ``text_col`` redacted in place (or beside the
    original as ``<text_col>_raw`` when ``keep_original``) plus one
    ``n_<kind>`` count column per pattern — the per-document audit
    trail. Counts are measured BEFORE any replacement runs, each on
    the original text, so overlapping classes report what they saw,
    not what an earlier replacement left behind."""
    patterns = patterns or PII_PATTERNS
    raw = F.col(text_col)
    counts = [
        F.regexp_count(raw, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat in patterns.items()
    ]
    out = df.select(
        "*",
        *counts,
        redact_text(raw, patterns, token_fmt).alias("__redacted"),
    )
    if keep_original:
        out = out.withColumnRenamed(text_col, f"{text_col}_raw")
    else:
        out = out.drop(text_col)
    return out.withColumnRenamed("__redacted", text_col)


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    by: str | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Corpus-level PII audit: total hits and affected-document counts
    per pattern class, optionally grouped ``by`` a source/domain
    column. One aggregation, map-side combinable."""
    patterns = patterns or PII_PATTERNS
    raw = F.col(text_col)
    per_doc = df.select(
        *( [by] if by else [] ),
        *[
            F.regexp_count(raw, F.lit(pat)).cast("long").alias(f"__c_{kind}")
            for kind, pat in patterns.items()
        ],
    )
    aggs = []
    for kind in patterns:
        aggs.append(F.sum(f"__c_{kind}").alias(f"total_{kind}"))
        aggs.append(
            F.sum((F.col(f"__c_{kind}") > 0).cast("long")).alias(
                f"docs_with_{kind}"
            )
        )
    aggs.append(F.count("*").alias("n_docs"))
    if by:
        return per_doc.groupBy(by).agg(*aggs)
    return per_doc.agg(*aggs)
