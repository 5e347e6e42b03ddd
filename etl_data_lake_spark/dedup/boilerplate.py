"""Boilerplate line removal — strip lines that repeat across many
documents of a source (navigation menus, cookie banners, license
headers, forum signatures), the CCNet/RefinedWeb-style cleanup that
runs between raw ingest and document-level dedup in a pretraining
pipeline. Document-level near-dup (MinHash, SimHash) cannot catch
this: two articles sharing a site chrome are NOT duplicates, but the
chrome itself is worthless training signal repeated millions of times.

Semantics: a line is boilerplate WITHIN a group (``group_col``,
typically the source/domain — crossing sources would let one site's
slogan delete another's quote) when it appears in at least
``min_docs`` distinct documents AND in at least ``min_frac`` of the
group's documents. Line identity is the TRIMMED line; lines shorter
than ``min_line_chars`` after trimming never qualify (the empty line
and bare punctuation appear everywhere by construction and stripping
them would reflow every document).

Scale shape (100 TB):

* stats = one ``split``/``posexplode`` fan-out (no Python) + ONE
  shuffle keyed (group, line) with map-side combine; per-group doc
  totals come from a separate tiny aggregate broadcast back — the
  corpus never shuffles twice.
* the boilerplate set is bounded by construction — at most
  ``docs/min_docs`` lines can clear the threshold, and real corpora
  yield a few hundred lines per source — so the strip step joins it
  broadcast by default (``broadcast_lines=False`` for a pathological
  corpus, paying a hash join).
* the rebuild touches ONLY documents that contained a boilerplate
  line (left-semi on the hit set), re-joining surviving lines in
  position order with the same ordered-frame collect_list
  construction as ``excise_spans`` — deliberately LAMBDA-FREE so the
  output column is a plain attribute that survives downstream
  Arrow-batched stages (the Catalyst projection-collapse trap,
  ROUND_NOTES round 3/4). Untouched documents keep their text
  byte-for-byte.

(The reference has no corpus-cleanup surface; north-star extension
material like the rest of the curation family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(docs: DataFrame, text_col: str, id_col: str, group_expr) -> DataFrame:
    """(doc, group, position, raw line, trimmed line) — one fan-out
    shared by stats and strip."""
    return docs.select(
        F.col(id_col).alias("_doc"),
        group_expr.alias("_grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn(
        # trim() strips only ASCII spaces; line identity must ignore
        # tabs/carriage returns too (Windows \r\n corpora)
        "_key",
        F.regexp_replace(F.col("_line"), r"^\s+|\s+$", ""),
    )


def line_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    min_line_chars: int = 4,
) -> DataFrame:
    """Per-(group, line) document frequency: ``group``, ``line`` (the
    trimmed form), ``n_docs`` (distinct documents containing it) and
    ``doc_frac`` (fraction of the group's documents). The audit view
    behind :func:`boilerplate_lines` — useful on its own for
    inspecting a new source before choosing thresholds."""
    group_expr = F.col(group_col) if group_col else F.lit("")
    per_group = docs.groupBy(group_expr.alias("_grp")).agg(
        F.countDistinct(F.col(id_col)).alias("_total")
    )
    counts = (
        _lines(docs, text_col, id_col, group_expr)
        .where(F.length("_key") >= min_line_chars)
        .groupBy("_grp", "_key")
        .agg(F.countDistinct("_doc").alias("n_docs"))
    )
    # null-SAFE group join: docs with a NULL group_col form a real
    # group (groupBy keeps the null key) and an equi-join would
    # silently drop every one of its lines from the stats
    per_group = F.broadcast(
        per_group.withColumnRenamed("_grp", "_tgrp")
    )
    return counts.join(
        per_group, counts["_grp"].eqNullSafe(per_group["_tgrp"])
    ).select(
        F.col("_grp").alias("group"),
        F.col("_key").alias("line"),
        "n_docs",
        (F.col("n_docs") / F.col("_total")).alias("doc_frac"),
    )


def boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    min_docs: int = 2,
    min_frac: float = 0.05,
    min_line_chars: int = 4,
) -> DataFrame:
    """The lines :func:`strip_boilerplate` will remove: (group, line,
    n_docs, doc_frac) rows clearing BOTH thresholds."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if not 0 < min_frac <= 1:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    return line_stats(docs, text_col, id_col, group_col, min_line_chars).where(
        (F.col("n_docs") >= min_docs) & (F.col("doc_frac") >= min_frac)
    )


def strip_boilerplate(
    docs: DataFrame,
    lines: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    out_col: str | None = None,
    broadcast_lines: bool = True,
) -> DataFrame:
    """Remove every boilerplate line (``lines``: the output of
    :func:`boilerplate_lines`, or any (group, line) frame) from each
    document of its group, preserving the order and BYTE CONTENT of
    every surviving line (matching is on the trimmed form; the kept
    raw line — indentation included — is what the rebuild emits).
    Documents containing no boilerplate keep their text byte-for-byte;
    a document that was pure boilerplate becomes the empty string."""
    out_col = out_col or text_col
    clash = {"_doc", "_grp", "_pos", "_line", "_key", "_hdoc", "_txt"} & set(
        docs.columns
    )
    if clash:
        raise ValueError(f"input already has column(s) {sorted(clash)}")
    group_expr = F.col(group_col) if group_col else F.lit("")
    bp = lines.select(
        F.col("group").alias("_bgrp"), F.col("line").alias("_bkey")
    ).distinct()
    if broadcast_lines:
        bp = F.broadcast(bp)
    toks = _lines(docs, text_col, id_col, group_expr)
    hit = (
        toks.join(
            bp,
            toks["_grp"].eqNullSafe(bp["_bgrp"])
            & (toks["_key"] == bp["_bkey"]),
            "left_semi",
        )
        .select(F.col("_doc").alias("_hdoc"))
        .distinct()
    )
    # hit is bounded by |documents containing boilerplate| — usually a
    # minority but NOT guaranteed small (a chrome-heavy source touches
    # every doc), so like excise_spans it joins hash-partitioned, never
    # broadcast
    kept = toks.join(hit, toks["_doc"] == hit["_hdoc"], "left_semi").join(
        bp,
        toks["_grp"].eqNullSafe(bp["_bgrp"])
        & (toks["_key"] == bp["_bkey"]),
        "left_anti",
    )
    whole = (
        Window.partitionBy("_doc")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rebuilt = (
        kept.withColumn(
            "_txt", F.concat_ws("\n", F.collect_list("_line").over(whole))
        )
        .groupBy("_doc")
        .agg(F.first("_txt").alias("_txt"))
    )
    out = (
        docs.join(hit, docs[id_col] == hit["_hdoc"], "left")
        .join(rebuilt, docs[id_col] == rebuilt["_doc"], "left")
        .withColumn(
            out_col,
            F.when(F.col("_hdoc").isNull(), F.col(text_col)).otherwise(
                F.coalesce("_txt", F.lit(""))
            ),
        )
    )
    return out.drop("_hdoc", "_doc", "_txt")
