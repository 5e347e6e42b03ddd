"""Corpus-level exact PARAGRAPH dedup (round 13) — the Dolma-style
stage between full-document exact dedup (dedup/exact.py) and
span-level substring dedup (dedup/substring.py): boilerplate blocks
(nav text, footers, license headers) repeat VERBATIM across millions
of pages at paragraph granularity, where document hashes never match
and substring matching is overkill. Dolma, RefinedWeb and CCNet all
run a paragraph-granularity exact pass; this module implements it
with a reproducible keep-first policy.

The repo already measures WITHIN-document paragraph repetition
(functions/repetition.dup_paragraph_fraction); this is the
ACROSS-corpus operator, sharing the same blank-line paragraph rule.

Reference parity note: the reference ETL (/root/reference/etl.py) has
no dedup stage at all beyond dropDuplicates (etl.py:71) — this is
training-data extension surface.

Scale shape (stated for 100 TB):

* paragraphs explode to (doc_id, para_idx, md5) — md5, not a 64-bit
  hash, because the keep decision GROUPS on the digest: at ~10^11
  paragraphs 64-bit birthday collisions are expected and every
  collision silently deletes an innocent paragraph; 128 bits puts
  that at ~10^-17. The raw paragraph text never enters the shuffle
  for the stats pass (digest + ids only).
* the keep-first decision is ONE window (partitionBy digest,
  orderBy (doc_id, para_idx), row_number = 1) — |paragraphs|-parallel;
  the decision needs the global minimum PER GROUP, so the window's
  shuffle is irreducible, and skew is bounded by the hottest
  boilerplate block — the same profile every public implementation
  has.
* reconstruction re-aggregates kept paragraphs per document and joins
  the new text back on the id — the one unavoidable corpus-wide join
  of any rewrite ACTION (same as substring excision).

DuckDB twin: queries/dedup_queries.PARAGRAPH_DEDUP_SQL replays the
whole keep-first ACTION in SQL (md5 exists on both engines, so
split, trim, digest, window and rebuild twin exactly), parity-checked
in tests/test_parity.py::test_library_twin_parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# blank-line-separated blocks — the same rule as
# functions/repetition.py's dup_paragraph_fraction
PARA_SPLIT_RE = r"\n{2,}"
# edge-whitespace normalization before hashing: Java and RE2 agree on
# this class for corpus text (see tests)
_EDGE_WS = r"(^\s+|\s+$)"


def _paragraphs(text: Column) -> Column:
    return F.filter(
        F.transform(
            F.split(text, PARA_SPLIT_RE),
            lambda p: F.regexp_replace(p, _EDGE_WS, ""),
        ),
        lambda p: p != "",
    )


def paragraph_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, para_idx, para, para_md5): trimmed, non-empty,
    blank-line-separated paragraphs in document order (0-indexed).
    One posexplode — per-row flatMap, inherits the input
    partitioning; the md5 digest is computed BEFORE any shuffle so
    downstream passes can drop the text column early."""
    return docs.select(
        F.col(id_col),
        F.posexplode(_paragraphs(F.col(text_col))).alias(
            "para_idx", "para"
        ),
    ).withColumn("para_md5", F.md5(F.col("para").cast("binary")))


def duplicate_paragraph_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_occurrences: int = 2,
) -> DataFrame:
    """→ (para_md5, n_occurrences, n_docs, keeper_doc_id,
    keeper_para_idx) for every paragraph occurring at least
    ``min_occurrences`` times corpus-wide — the audit view (Dolma's
    taggers-then-mixers shape: inspect before destroying). One hash
    aggregation over (digest, ids) — map-side combinable, the text
    column is pruned before the exchange."""
    if min_occurrences < 1:
        raise ValueError(
            f"min_occurrences must be >= 1, got {min_occurrences}"
        )
    paras = paragraph_table(docs, text_col, id_col)
    return (
        paras.select(
            "para_md5",
            F.col(id_col),
            F.struct(F.col(id_col), F.col("para_idx")).alias("_pos"),
        )
        .groupBy("para_md5")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.count_distinct(id_col).cast("long").alias("n_docs"),
            F.min("_pos").alias("_keeper"),
        )
        .where(F.col("n_occurrences") >= min_occurrences)
        .select(
            "para_md5",
            "n_occurrences",
            "n_docs",
            F.col(f"_keeper.{id_col}").alias("keeper_doc_id"),
            F.col("_keeper.para_idx").alias("keeper_para_idx"),
        )
    )


def drop_duplicate_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "first",
) -> DataFrame:
    """The ACTION: rewrite every document's ``text_col`` with
    duplicate paragraphs removed. ``keep='first'`` (default, the
    Dolma/CCNet policy) retains the globally first occurrence —
    ordered by (doc_id, para_idx), so the decision is deterministic
    under repartitioning and retries; ``keep='none'`` removes EVERY
    occurrence of any corpus-duplicated paragraph (the aggressive
    boilerplate-kill some pipelines run on nav/footer text).

    Kept paragraphs rejoin with a blank line (``\\n\\n``) — the
    paragraph rule is the normalization, as with substring excision.
    Documents whose every paragraph drops come back with empty text
    (callers filter; silently losing rows would corrupt downstream
    joins). All non-text columns pass through byte-for-byte."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    paras = paragraph_table(docs, text_col, id_col)
    w = Window.partitionBy("para_md5")
    if keep == "first":
        marked = paras.withColumn(
            "_rn",
            F.row_number().over(
                w.orderBy(F.col(id_col), F.col("para_idx"))
            ),
        ).where(F.col("_rn") == 1)
    else:
        marked = paras.withColumn(
            "_n", F.count("*").over(w)
        ).where(F.col("_n") == 1)
    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("para_idx"), F.col("para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                "\n\n",
            ).alias("_new_text")
        )
    )
    out_cols = [
        F.coalesce(F.col("_new_text"), F.lit("")).alias(c)
        if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return (
        docs.drop(text_col)
        .join(rebuilt, id_col, "left")
        .select(*out_cols)
    )


def excise_paragraphs(
    docs: DataFrame,
    digests,
    text_col: str = "text",
    max_digests: int = 100_000,
) -> DataFrame:
    """Stateless paragraph excision against a FROZEN digest blocklist
    — the deploy split of this module: a nightly batch pass finds the
    corpus's hottest boilerplate (:func:`duplicate_paragraph_stats`,
    take the top-K ``para_md5``), and ingest drops those paragraphs
    from every arriving document. Because the rule is a pure per-row
    expression (split → filter against the digest set → rejoin), the
    SAME call works on a STREAMING frame (readStream → gate → sink),
    unlike the corpus-wide window of
    :func:`drop_duplicate_paragraphs`.

    ``digests`` is a bounded python iterable of md5 hex strings; the
    set compiles into the plan as an InSet (hash probe inside
    codegen), so it must be a RULE SET, not a corpus artifact —
    ``max_digests`` raises loudly past the bound rather than letting
    a million-entry literal melt the driver. Kept paragraphs rejoin
    with a blank line; all other columns pass through untouched."""
    dig = sorted({str(d).lower() for d in digests})
    if not dig:
        raise ValueError(
            "excise_paragraphs needs at least one digest — an empty "
            "blocklist would be a silent no-op"
        )
    if len(dig) > max_digests:
        raise ValueError(
            f"{len(dig)} digests exceed max_digests={max_digests}: "
            "a plan-literal set must stay a bounded rule set; for "
            "corpus-sized blocklists use drop_duplicate_paragraphs"
        )
    kept = F.filter(
        _paragraphs(F.col(text_col)),
        lambda p: ~F.md5(p.cast("binary")).isin(dig),
    )
    return docs.withColumn(
        text_col,
        F.when(
            F.col(text_col).isNull(), F.lit(None).cast("string")
        ).otherwise(F.array_join(kept, "\n\n")),
    )
