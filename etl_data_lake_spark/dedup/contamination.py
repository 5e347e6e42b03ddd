"""Cross-corpus decontamination: benchmark leakage detection + excision.

Within-corpus substring dedup (dedup/substring.py) answers "what text
repeats inside my training set"; this module answers the OTHER
question every LLM pipeline must: "which training passages appear
verbatim in my evaluation/benchmark sets" — train/test contamination,
the decontamination step of Lee et al. (ACL 2022) §"test-set
contamination" and standard practice since GPT-3's n-gram overlap
filtering (Brown et al. 2020, Appendix C). The reference engine has
no counterpart; this is extension surface for the training-data
pipeline family.

Detection reuses the window-hash machinery wholesale: a training span
is contaminated iff one of its ``w``-token windows hashes equal to
ANY window of the reference corpus. Two scale asymmetries make this
cheap at 100 TB:

* reference corpora (benchmarks) are orders of magnitude smaller than
  training corpora → their DISTINCT window-hash set broadcasts, so
  marking is a map-side semi join over the train windows — the 100 TB
  side never shuffles (``broadcast_reference=True``, the default;
  flip it off for a reference too big to broadcast and pay one
  hash-partitioned semi join instead);
* the span merge then runs over MARKED train windows only
  (gaps-and-islands per doc — dedup/substring.merge_spans), volume =
  |contaminated windows|, which for a healthy corpus is ~0.

Remediation is either document-level (drop docs whose
``dup_ratio`` from :func:`contamination_stats` exceeds a threshold —
compose with queries/curation.py) or span-level
(:func:`excise_spans`: cut just the contaminated tokens, keep the
document — what you do when a license header leaks into a benchmark
but the surrounding document is good data).

Both hash families of dedup/substring.window_hashes apply: the poly
hash for cross-engine-checkable runs, xxhash64 for collision
resistance at scale (a collision here FALSELY excises training text —
cheap insurance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.substring import merge_spans, window_hashes
from etl_data_lake_spark.functions.text import tokens


def contaminated_spans(
    train: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
    broadcast_reference: bool = True,
) -> DataFrame:
    """→ (doc_id, span_start, span_end, span_tokens): maximal spans of
    TRAIN documents whose every ``w``-token window appears verbatim
    somewhere in REFERENCE. Every shared substring of ≥ w tokens is
    found (it contains a shared w-window at each offset); shorter
    overlaps are below the detection floor by design."""
    t = window_hashes(train, text_col, id_col, w, hasher)
    r = (
        window_hashes(reference, text_col, id_col, w, hasher)
        .select("whash")
        .distinct()
    )
    if broadcast_reference:
        r = F.broadcast(r)
    marked = t.join(r, "whash", "left_semi").select("doc_id", "pos")
    return merge_spans(marked, w)


def contamination_stats(
    train: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
    broadcast_reference: bool = True,
) -> DataFrame:
    """Per-train-document contamination profile (n_tokens, dup_tokens,
    n_spans, dup_ratio) against the reference corpus — the number a
    curation pipeline thresholds on ('drop docs >X% benchmark
    text'). Clean documents report 0."""
    from etl_data_lake_spark.dedup.substring import span_doc_stats

    spans = contaminated_spans(
        train, reference, text_col, id_col, w, hasher, broadcast_reference
    )
    return span_doc_stats(train, spans, text_col, id_col)


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str | None = None,
    broadcast_spans: bool = False,
) -> DataFrame:
    """Span-level remediation: remove every token inside a span from
    the document text, keep everything else. → the input rows with
    ``out_col`` (default: ``text_col``, replaced in place) holding the
    cleaned text — tokens joined by single spaces (the tokenizer is
    whitespace-normalizing, so a clean doc round-trips modulo runs of
    whitespace).

    Plan shape — deliberately LAMBDA-FREE: rebuild touches only the
    CONTAMINATED documents (semi join on the span doc set), exploding
    their tokens once, dropping covered positions with one left-anti
    range join against the spans, and re-joining the survivors in
    position order (ordered-frame collect_list — the same
    no-inlining-trap construction as the xxhash64 window hasher).
    Everything stays JVM-side and, crucially, every produced column is
    a plain attribute: an earlier higher-order-function formulation
    (transform/filter/exists lambdas) broke any DOWNSTREAM pandas-UDF
    consumer, because Catalyst collapses the lambda expressions into
    the Python UDF's input, which the UDF-extraction rule cannot
    evaluate — re-running contamination detection over excised output
    is exactly that composition, and a test pins it. Documents without
    spans keep their original text byte-for-byte; a fully-excised
    document becomes the empty string. The span side joins
    hash-partitioned by default — it is bounded by |contaminated
    docs|, small for a healthy corpus but NOT guaranteed small, so
    broadcasting is opt-in (``broadcast_spans=True``)."""
    out_col = out_col or text_col
    from pyspark.sql import Window

    sp = spans.select(
        F.col("doc_id").alias("_sdoc"), "span_start", "span_end"
    )
    span_docs = sp.select(F.col("_sdoc").alias("_cdoc")).distinct()
    if broadcast_spans:
        sp = F.broadcast(sp)
        span_docs = F.broadcast(span_docs)
    toks = docs.join(
        span_docs, docs[id_col] == span_docs["_cdoc"], "left_semi"
    ).select(
        F.col(id_col).alias("_tdoc"),
        F.posexplode(F.filter(tokens(text_col), lambda t: t != "")).alias(
            "_pos", "_tok"
        ),
    )
    kept = toks.join(
        sp,
        (toks["_tdoc"] == sp["_sdoc"])
        & (toks["_pos"] >= sp["span_start"])
        & (toks["_pos"] < sp["span_end"]),
        "left_anti",
    )
    whole = (
        Window.partitionBy("_tdoc")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rebuilt = (
        kept.withColumn(
            "_txt", F.concat_ws(" ", F.collect_list("_tok").over(whole))
        )
        .groupBy("_tdoc")
        .agg(F.first("_txt").alias("_txt"))
    )
    out = (
        docs.join(span_docs, docs[id_col] == span_docs["_cdoc"], "left")
        .join(rebuilt, docs[id_col] == rebuilt["_tdoc"], "left")
        .withColumn(
            out_col,
            F.when(
                F.col("_cdoc").isNull(), F.col(text_col)
            ).otherwise(F.coalesce("_txt", F.lit(""))),
        )
    )
    return out.drop("_cdoc", "_tdoc", "_txt")


def contamination_stream_sink(
    spark,
    reference: DataFrame,
    clean_path: str,
    quarantine_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    hasher: str = "poly",
    max_dup_ratio: float = 0.0,
    app_id: str = "__contam_sink__",
):
    """``foreachBatch`` decontamination gate (round-10 verdict #8):
    every ingested micro-batch is screened against the REFERENCE
    corpus (benchmarks/eval sets) and routed — clean documents append
    to ``clean_path`` (a txn table), documents whose contaminated
    token share exceeds ``max_dup_ratio`` to ``quarantine_path``,
    tagged with their (n_tokens, dup_tokens, n_spans, dup_ratio)
    audit columns. The streaming form of the batch
    :func:`contamination_stats` + threshold composition, built on
    ``expectations_stream_sink``'s exactly-once discipline.

    Correctness details (the round-9 sink lessons, applied here):

    * the reference window-hash set is computed ONCE at sink
      construction and persisted — the per-batch cost is one
      broadcast semi join over the batch's windows, never a rescan
      of the reference;
    * each batch is PERSISTED across detection and both appends, so
      the rows screened are the rows published (a nondeterministic
      source cannot pass detection with one execution and publish
      another);
    * detection is per-document against a static reference — no
      cross-batch state — so stream output EQUALS the batch operator
      over the same rows, however the stream chops them (test-pinned
      batch≡stream);
    * both appends commit with (app_id, batch id): a crash between
      the clean append and the quarantine append replays into
      clean no-op + quarantine apply — each table exactly-once."""
    from etl_data_lake_spark.dedup.substring import span_doc_stats
    from etl_data_lake_spark.sources.txn import TxnTable

    if not 0.0 <= max_dup_ratio < 1.0:
        raise ValueError(
            f"max_dup_ratio must be in [0, 1), got {max_dup_ratio}"
        )
    clean_tbl = TxnTable(spark, str(clean_path))
    quar_tbl = (
        TxnTable(spark, str(quarantine_path))
        if quarantine_path is not None
        else None
    )
    ref_hashes = (
        window_hashes(reference, text_col, id_col, w, hasher)
        .select("whash")
        .distinct()
        .persist()
    )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            t = window_hashes(batch_df, text_col, id_col, w, hasher)
            marked = t.join(
                F.broadcast(ref_hashes), "whash", "left_semi"
            ).select("doc_id", "pos")
            stats = span_doc_stats(
                batch_df, merge_spans(marked, w), text_col, id_col
            )
            bad = stats.where(
                F.col("dup_ratio") > max_dup_ratio
            ).persist()
            try:
                bad_ids = bad.select(
                    F.col("doc_id").alias("_bad_id")
                )
                clean = batch_df.join(
                    F.broadcast(bad_ids),
                    batch_df[id_col] == bad_ids["_bad_id"],
                    "left_anti",
                )
                clean_tbl.append(
                    clean, app_id=app_id, txn_seq=batch_id
                )
                if quar_tbl is not None:
                    quarantined = batch_df.join(
                        F.broadcast(
                            bad.withColumnRenamed("doc_id", "_bad_id")
                        ),
                        batch_df[id_col] == F.col("_bad_id"),
                        "inner",
                    ).drop("_bad_id")
                    quar_tbl.append(
                        quarantined, app_id=app_id, txn_seq=batch_id
                    )
            finally:
                bad.unpersist()
        finally:
            batch_df.unpersist()

    return fn
