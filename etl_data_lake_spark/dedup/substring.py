"""Exact-substring (repeated-span) dedup across a corpus.

Whole-document dedup (exact.py, minhash.py) misses the common failure
mode of web-scale training data: long VERBATIM passages (boilerplate,
licenses, quoted articles) embedded inside otherwise-distinct
documents. The remedy popularized for LLM corpora (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022)
is suffix-array exact-substring matching; a suffix array is a
sequential single-machine structure, so the distributed re-expression
here keeps the same DETECTION semantics for a fixed window size:

1. slide a ``w``-token window over each document (one explode — the
   same |docs|·|tokens| fan-out every shingle operator here pays);
2. hash each window with the repo's cross-engine polynomial hash
   composed from per-token hashes (functions.text — no window strings
   are materialized);
3. a window hash seen in ≥2 documents (or ≥2 positions of one
   document) marks every occurrence as duplicated text;
4. per document, merge overlapping/adjacent marked windows into
   MAXIMAL repeated spans ([start, end) in token positions) — a
   span of k consecutive duplicated windows is a repeated substring
   of k+w-1 tokens.

Every duplicated substring of length ≥ w is found exactly (any such
substring contains a duplicated w-window at every offset); substrings
shorter than w are below the detection threshold by design — the same
w-token floor the suffix-array formulation uses as its minimum match
length.

Scale shape: explode → one groupBy on the 64-bit-ish window hash with
an early ``count ≤ 1`` prune (map-side combined; the overwhelmingly
common unique window never shuffles twice) → per-doc sort-merge of the
surviving marked positions (a window aggregate over positions, data
volume = |duplicated windows| only). No self-joins, no quadratic
term. Hash collisions (≈ |windows|²/2·1e-9 at the 1e9+7 modulus) can
mark a false duplicate span with the default cross-engine poly hash;
``hasher="xxhash64"`` switches to a collision-resistant 64-bit JVM
path for engine-local scale runs (span equality with the poly path is
test-pinned) — the plan shape is unchanged.

The span merge is gaps-and-islands in SQL (same pattern as the
sessionize oracle), so the operator is fully oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.text import tokens
from etl_data_lake_spark.sources.catalog import fan_out


def window_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
) -> DataFrame:
    """→ (doc_id, pos, whash): the hash of every ``w``-token window,
    0-based token position. Documents shorter than ``w`` tokens emit
    nothing.

    ``hasher`` picks the window-hash family — a real parameter, not a
    prose escape hatch, because the two have different jobs:

    * ``"poly"`` (default): the cross-engine 1e9+7 polynomial fold,
      Arrow-batched (functions.text.window_hashes_pandas_udf — the
      pure-expression form of this fold gets re-inlined per window
      reference by the optimizer and was measured at
      O(windows·w·tokens·chars) interpreted calls: 139 s at sf0.1 vs
      <1 s batched). Bit-reproducible in DuckDB → the oracle entries
      use it. Collision odds ≈ |windows|²·5e-10 — and MEASURED, not
      hypothetical: the sf0.001 corpus (~6·10⁴ windows) already has
      two cross-doc collisions producing two false spans, text-
      verified unique and test-pinned as exactly the rows the
      xxhash64 path omits.
    * ``"xxhash64"``: full 64-bit collision resistance for
      engine-local scale runs. Stays JVM-side the whole way —
      posexplode the token array once, then ``xxhash64`` over an
      ordered-frame ``collect_list`` of each window's tokens — which
      sidesteps the expression-inlining trap by construction (no
      recursive reference to a computed array; the window frame
      materializes each w-token slice exactly once). Not
      SQL-oracle-reproducible; span-level equality with the poly path
      is pinned in tests instead.
    """
    docs = fan_out(docs)  # BEFORE the hashing projection, so the
    # CPU-heavy fan-out runs post-exchange on full parallelism
    if hasher == "xxhash64":
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.filter(tokens(text_col), lambda t: t != "")
            ).alias("pos", "tok"),
        )
        frame = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.currentRow, w - 1)
        )
        warr = toks.withColumn("warr", F.collect_list("tok").over(frame))
        return warr.where(F.size("warr") == w).select(
            "doc_id", "pos", F.xxhash64("warr").alias("whash")
        )
    if hasher != "poly":
        raise ValueError(f"unknown hasher {hasher!r}")
    from etl_data_lake_spark.functions.text import window_hashes_pandas_udf

    h = window_hashes_pandas_udf(w)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        h(F.col(text_col)).alias("_wh"),
    )
    return out.select("doc_id", F.posexplode("_wh").alias("pos", "whash"))


def duplicated_windows(window_tbl: DataFrame) -> DataFrame:
    """→ the (doc_id, pos, whash) rows whose hash occurs ≥2 times in
    the corpus (across documents or repeated within one).

    One pass (round 14): ``count(*) over (partition by whash)`` + a
    filter — the window table is scanned ONCE and shuffled ONCE. The
    previous aggregate-then-join-back form paid the Arrow window-hash
    scan twice (once under the count aggregation, once under the probe
    side of the join) plus a second full-table shuffle for the join;
    the count-window form trades the hash aggregate for a sort within
    the single whash exchange, strictly fewer passes at any scale.

    Skew exposure (round 15, measured and accepted): window functions
    have no partial aggregation, so a globally-hot window hash (one
    viral boilerplate paragraph corpus-wide) colocates ALL its
    occurrences in one task's sort. Both skew-safe alternatives —
    two-level ``groupBy(whash)`` count + join-back over a persisted
    window table, and the same with a broadcast of the dup-hash set
    over a recomputed scan — were measured 25–30% SLOWER end-to-end
    (the Arrow window-hash scan and the extra materialization dominate
    the saved sort). A corpus known to contain viral exact duplicates
    should run exact-dedup first or use
    :func:`maximal_match_spans`'s ``max_occurrences`` valve, which
    bounds the same hot set before the pair join."""
    counted = window_tbl.withColumn(
        "n_occ", F.count("*").over(Window.partitionBy("whash"))
    )
    return counted.where(F.col("n_occ") > 1).select("doc_id", "pos")


def merge_spans(marked: DataFrame, w: int) -> DataFrame:
    """(doc_id, pos) marked windows → maximal merged spans. Two marked
    windows at positions p, q (p < q) belong to one span iff q − p ≤ w
    — their token ranges overlap or touch — implemented as
    gaps-and-islands with a lag window per document (state =
    |marked windows|, not |tokens|). Shared by within-corpus repeated
    spans and cross-corpus contamination spans."""
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    flagged = marked.withColumn(
        "new_span",
        F.when(
            F.col("pos") - F.lag("pos").over(by_doc) <= w, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    grouped = flagged.withColumn(
        "span_id", F.sum("new_span").over(
            by_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    return (
        grouped.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(w)).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
) -> DataFrame:
    """→ (doc_id, span_start, span_end, span_tokens): maximal repeated
    spans per document, in token positions; ``span_end`` exclusive,
    ``span_tokens = span_end - span_start``. Every duplicated
    substring of ≥ ``w`` tokens appears as (part of) exactly one span
    (see :func:`merge_spans` for the merge rule)."""
    marked = duplicated_windows(
        window_hashes(docs, text_col, id_col, w, hasher)
    )
    return merge_spans(marked, w)


def repeated_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
) -> DataFrame:
    """Per-document contamination profile: how many tokens sit inside
    repeated spans and what fraction of the document that is — the
    number a curation pipeline thresholds on ("drop docs >50% verbatim
    duplicate text") or uses to excise spans before training. Documents
    with no repeated span report 0 (left join, not an inner filter)."""
    spans = repeated_spans(docs, text_col, id_col, w, hasher)
    return span_doc_stats(docs, spans, text_col, id_col)


def span_doc_stats(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document profile of ANY span table (repeated spans,
    cross-corpus contamination spans): tokens inside spans, span
    count, and the dup_ratio a curation pipeline thresholds on.
    Documents with no span report 0 (left join, not an inner
    filter)."""
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count("*").cast("long").alias("n_spans"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(tokens(text_col), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                * F.lit(1.0)
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


def maximal_match_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
    max_occurrences: int | None = 10_000,
) -> DataFrame:
    """Pair-attributed MAXIMAL repeated substrings (variable length):
    → (doc_a, doc_b, a_start, a_end, b_start, b_end, match_tokens),
    one row per maximal verbatim match of ≥ ``w`` tokens between two
    documents (or two positions of one document: doc_a == doc_b,
    a_start < b_start). Ends exclusive, token positions.

    :func:`repeated_spans` answers "which of MY tokens are duplicated
    somewhere" (per-doc window-union spans — the removal form); this
    operator answers the suffix-array question of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"):
    WHAT matches WHERE, at exact variable-length boundaries. A
    window-union span can weld two unrelated repeats that touch
    within ``w`` tokens; a pair match cannot.

    The suffix array is a sequential structure; the distributed
    re-expression needs no token re-comparison at all, by a diagonal
    argument: a shared substring of length L ≥ w contains exactly
    L−w+1 matching w-windows at CONSECUTIVE positions on one diagonal
    d = a_pos − b_pos, and conversely a maximal run of consecutive
    window matches on a diagonal IS a maximal match — it cannot
    extend by even one token, because that token would complete one
    more matching w-window on the same diagonal (its other w−1 tokens
    lie in the already-shared region), contradicting run maximality.
    So: equi-join window hashes, then gaps-and-islands per
    (doc_a, doc_b, diagonal) ordered by position — EXACT maximal
    boundaries (modulo hash collisions; ``hasher="xxhash64"`` for the
    collision-resistant engine-local path, same contract as
    :func:`window_hashes`).

    Scale shape: the ``HAVING count ≥ 2`` prune drops the
    unique-window majority before the self-join, and the join carries
    only duplicated-window occurrences. The quadratic cliff is the
    GLOBALLY HOT window (site boilerplate in 10⁵ documents → 10¹⁰
    pairs from one hash); ``max_occurrences`` drops window hashes
    with more occurrences than that from pairing — matches running
    through a dropped window SPLIT at it (and matches shorter than w
    past it vanish), the standard practical trade for boilerplate
    suppression. ``max_occurrences=None`` is the exact mode; the
    default keeps one hash's pair fan-out ≤ ~5·10⁷.

    Fully oracle-expressible (the poly-hash path) — DuckDB twin in
    queries/dedup_queries.MAXIMAL_MATCH_SPANS_SQL.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if max_occurrences is not None and max_occurrences < 2:
        raise ValueError(
            f"max_occurrences must be >= 2 (or None), got {max_occurrences}"
        )
    wh = window_hashes(docs, text_col, id_col, w, hasher)
    # one pass + one shuffle for the occurrence prune (the
    # duplicated_windows round-14 shape: count-over-window instead of
    # aggregate-then-join-back, which re-ran the Arrow scan)…
    eligible = F.col("n_occ") > 1
    if max_occurrences is not None:
        eligible = eligible & (F.col("n_occ") <= max_occurrences)
    dup = (
        wh.withColumn(
            "n_occ", F.count("*").over(Window.partitionBy("whash"))
        )
        .where(eligible)
        .select("whash", "doc_id", "pos")
        # …then MATERIALIZE the surviving occurrences: both sides of
        # the pair self-join read this frame, and without the
        # lineage-cut each side re-executes the whole scan+shuffle.
        # Bounded by duplicated-window occurrences only — the unique-
        # window majority is already gone.
        .localCheckpoint(eager=True)
    )

    a = dup.select(
        "whash",
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("a_pos"),
    )
    b = dup.select(
        "whash",
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("b_pos"),
    )
    pairs = a.join(b, "whash").where(
        (F.col("doc_a") < F.col("doc_b"))
        | (
            (F.col("doc_a") == F.col("doc_b"))
            & (F.col("a_pos") < F.col("b_pos"))
        )
    )
    diag = pairs.select(
        "doc_a",
        "doc_b",
        "a_pos",
        "b_pos",
        (F.col("a_pos") - F.col("b_pos")).alias("diag"),
    )
    by_diag = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("a_pos")
    flagged = diag.withColumn(
        "new_run",
        F.when(
            F.col("a_pos") - F.lag("a_pos").over(by_diag) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(
            by_diag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "run_id")
        .agg(
            F.min("a_pos").cast("long").alias("a_start"),
            (F.max("a_pos") + F.lit(w)).cast("long").alias("a_end"),
            F.min("b_pos").cast("long").alias("b_start"),
            (F.max("b_pos") + F.lit(w)).cast("long").alias("b_end"),
        )
        .select(
            "doc_a",
            "doc_b",
            "a_start",
            "a_end",
            "b_start",
            "b_end",
            (F.col("a_end") - F.col("a_start")).alias("match_tokens"),
        )
    )


def dedup_repeated_substrings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    min_length: int | None = None,
    hasher: str = "xxhash64",
    max_occurrences: int | None = 10_000,
) -> DataFrame:
    """The complete Lee et al. 2022 dedup ACTION: find every maximal
    repeated substring of ≥ ``min_length`` tokens (default: ``w``)
    and remove all occurrences EXCEPT the first — the copy in the
    lowest doc id (earliest position for within-doc repeats) survives,
    every other copy is excised. → the input rows with ``text_col``
    rewritten (contamination's :func:`excise_spans` does the cut, so
    untouched documents keep their text byte-for-byte and the
    plan stays lambda-free / pandas-UDF-composable).

    Unlike the read-only span finders, this path DESTROYS text on hash
    equality, so its default hasher is the collision-resistant 64-bit
    ``xxhash64`` (round-12 ADVICE fix): at corpus scale the 'poly'
    family's ~1e9 space gives birthday collisions that would excise
    non-duplicate text. ``hasher="poly"`` remains available for the
    oracle-twinned diagnostics that must match the SQL twin's
    arithmetic.

    Keep-first falls out of :func:`maximal_match_spans`' canonical
    pair orientation: every match row has doc_a < doc_b (or
    a_start < b_start within one doc), so the union of b-side spans
    is exactly "every occurrence that has an earlier twin" — a
    substring in n documents is excised from the n−1 later ones via
    their pairs with EARLIER holders, and the earliest holder never
    appears on a b side. Overlapping cut spans union naturally
    (excision drops covered positions, not span rows).

    ``min_length`` is the paper's dedup threshold (they use 50
    tokens); matches shorter than it are left alone. Scale shape is
    maximal_match_spans' (candidates-sized) plus excise_spans'
    (rebuild touches only documents that lose a span)."""
    if min_length is None:
        min_length = w
    if min_length < w:
        raise ValueError(
            f"min_length={min_length} is below the detection window "
            f"w={w} — shorter repeats are invisible by construction"
        )
    matches = maximal_match_spans(
        docs, text_col, id_col, w, hasher, max_occurrences
    ).where(F.col("match_tokens") >= min_length)
    cuts = matches.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("span_start"),
        F.col("b_end").alias("span_end"),
    ).distinct()
    # materialize the cut set ONCE (round 12): excise_spans reads its
    # span side twice (hit-doc semi join + the positional anti join),
    # and without a checkpoint each read re-runs the ENTIRE match
    # pipeline — window hashes, self-join, diagonal windows — tripling
    # the dominant cost. The cuts table is bounded by the losing spans
    # (candidates-sized, tiny next to the corpus), so this is the
    # cheap side to pin down. localCheckpoint also truncates the
    # lineage the rebuild join would otherwise re-plan.
    cuts = cuts.localCheckpoint()
    from etl_data_lake_spark.dedup.contamination import excise_spans

    return excise_spans(docs, cuts, text_col, id_col)
