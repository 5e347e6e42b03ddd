"""Deduplication queries over the documents table.

Four strategies, strongest-oracle-first: exact (hash groupBy), n-gram
Jaccard (quadratic baseline), MinHash+LSH (the scale path — identical
integer math reproduced in the DuckDB oracle), SimHash fingerprints.
The reference's only dedup is full-row ``dropDuplicates`` (etl.py:71);
everything here is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.exact import canonicalize_exact
from etl_data_lake_spark.dedup.jaccard import jaccard_pairs, shingle_table
from etl_data_lake_spark.dedup.minhash import (
    PERM_A,
    PERM_B,
    minhash_lsh_pairs,
)
from etl_data_lake_spark.dedup.simhash import N_BITS, simhash_table
from etl_data_lake_spark.functions.text import (
    MOD,
    poly_hash,
    sql_hashed_word_shingles,
    sql_poly_hash,
)
from etl_data_lake_spark.functions.vectors import sql_cosine
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.sources.catalog import load_table

_TOK = "regexp_split_to_array(trim(text), '\\s+')"


def _shingle_str(source: str = "documents") -> str:
    """Shingle-exploding subquery over any (doc_id, text) relation —
    composable so filtered-corpus pipelines reuse the exact math."""
    return (
        f"SELECT doc_id, unnest(list_transform(range(1, len({_TOK}) - 1),"
        f" i -> ({_TOK})[i] || ' ' || ({_TOK})[i+1] || ' ' || ({_TOK})[i+2]))"
        f" AS shingle FROM {source}"
    )


_SHINGLE_STR = _shingle_str()


# --------------------------------------------------------------------------
# Exact dedup with planted duplicates (the corpus has none; we union a
# shifted copy of every 10th doc so the operator's group/canonical
# semantics are actually exercised).
# --------------------------------------------------------------------------
@register(
    "dedup_exact_canonical",
    oracle="""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM documents
            WHERE doc_id % 10 = 0
        )
        SELECT md5(text) AS content_md5,
               MIN(doc_id) AS canonical_id,
               COUNT(*) AS dup_count
        FROM corpus
        GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return canonicalize_exact(docs.unionByName(planted))


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact baseline, string shingles).
# Library twin since round 11 — its driver slot went to
# interval_join_first_hour; the shingle/Jaccard math still gets a
# driver row through dedup_minhash_lsh_pairs (same shingle pipeline,
# exact-Jaccard verify stage) and text_simhash, and this exact query
# stays parity-checked in test_parity::test_library_twin_parity.
# --------------------------------------------------------------------------
DEDUP_NGRAM_JACCARD_PAIRS_SQL = f"""
        WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLE_STR})),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b,
               i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
    """


def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(shingle_table(docs), threshold=0.5)


# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs — k=12 permutations, 4 bands × 3 rows,
# exact-Jaccard verify at 0.5. The oracle below reproduces the integer
# pipeline (generated from the same constants).
# --------------------------------------------------------------------------
def _minhash_oracle(
    k: int = 12, bands: int = 4, rows: int = 3, source: str = "documents"
) -> str:
    mins = ",\n               ".join(
        f"MIN((shingle * {PERM_A[i]} + {PERM_B[i]}) % {MOD}) AS mh{i}"
        for i in range(k)
    )
    band_selects = []
    for b in range(bands):
        cols = [f"mh{b * rows + r}" for r in range(rows)]
        key = cols[0]
        for c in cols[1:]:
            key = f"(({key}) * 31 + {c}) % {MOD}"
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {key} AS band_key FROM sigs"
        )
    band_tbl = "\n            UNION ALL ".join(band_selects)
    return f"""
        WITH sh AS (
            SELECT DISTINCT doc_id,
                   unnest({sql_hashed_word_shingles(_TOK)}) AS shingle
            FROM {source}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        sigs AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        band_tbl AS (
            {band_tbl}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM band_tbl a JOIN band_tbl b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b,
               i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
    """


@register(
    "dedup_minhash_lsh_pairs",
    oracle=_minhash_oracle(),
    tags=("dedup", "lsh", "flagship"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.5)


# --------------------------------------------------------------------------
# Per-doc hash fingerprints: SimHash (Hamming pairing exercised in
# tests) + char-level polynomial rolling hash + md5 content address —
# formerly the separate text_fingerprints entry, folded in under the
# 50-entry driver cap; all three are per-doc hash projections, one
# narrow join on doc_id after the shingle aggregate.
# --------------------------------------------------------------------------
def _simhash_oracle() -> str:
    bit_sums = ",\n               ".join(
        f"SUM(((h // {1 << j}) % 2) * 2 - 1) AS s{j}" for j in range(N_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_BITS)
    )
    return f"""
        WITH hashed AS (
            SELECT DISTINCT doc_id,
                   unnest({sql_hashed_word_shingles(_TOK)}) AS h
            FROM documents
        ),
        bit_sums AS (
            SELECT doc_id,
               {bit_sums}
            FROM hashed GROUP BY doc_id
        )
        SELECT b.doc_id, CAST({fp} AS BIGINT) AS simhash,
               {sql_poly_hash('d.text')} AS fingerprint,
               md5(d.text) AS content_md5
        FROM bit_sums b JOIN documents d ON b.doc_id = d.doc_id
    """


# Library twin since round 12 (slot rotated to the keep-first
# repeated-substring dedup ACTION below; the Hamming math stays pinned
# in test_text_dedup) — parity-checked in test_library_twin_parity.
TEXT_SIMHASH_SQL = _simhash_oracle()


def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fingerprints = docs.select(
        "doc_id",
        poly_hash("text").alias("fingerprint"),
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
    )
    return simhash_table(docs).join(fingerprints, "doc_id")


# --------------------------------------------------------------------------
# Duplicate CLUSTERING: connected components over the MinHash-LSH pair
# graph (iterative min-label propagation in Spark; the oracle closes
# the same graph with a recursive CTE — viable because candidate
# graphs are tiny relative to the corpus).
# --------------------------------------------------------------------------
def _cluster_oracle() -> str:
    return f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle()}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(n, m) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src
        )
        SELECT n AS doc_id, MIN(m) AS cluster_id
        FROM reach GROUP BY n
    """


@register(
    "dedup_minhash_clusters",
    oracle=_cluster_oracle(),
    tags=("dedup", "graph", "iterative"),
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.dedup.cluster import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    return connected_components(pairs)


# --------------------------------------------------------------------------
# Exact-substring repeated spans (dedup/substring.py): verbatim
# passages ≥ w tokens shared across (or repeated within) documents,
# merged to maximal spans. The oracle replays the identical pipeline:
# positional composed window hashes (same base-31 fold as the shingle
# family), hot-hash prune, lag/running-sum gaps-and-islands merge.
# Registered round 3 in the slot freed by demoting
# window_lag_rank_running (lag/rank/running analytics stay covered by
# window_frame_trailing_spend + window_surrogate_key + the session
# aggregates — and this oracle itself exercises lag + running sum).
# --------------------------------------------------------------------------
_SPAN_W = 8


def _window_cte(w: int) -> str:
    """toks/hashed/flat CTE text — the positional composed window
    hashes shared by the repeated-spans and maximal-match oracles."""
    tk = f"list_filter({_TOK}, t -> t != '')"
    th = f"list_transform(tk, t -> {sql_poly_hash('t')})"
    acc = "th[i]"
    for j in range(1, w):
        acc = f"(({acc}) * 31 + th[i+{j}]) % {MOD}"
    return f"""
        WITH toks AS (
            SELECT doc_id, {tk} AS tk FROM documents
        ),
        hashed AS (
            SELECT doc_id, {th} AS th FROM toks
        ),
        flat AS (
            SELECT doc_id, w.pos AS pos, w.wh AS whash
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(th) - {w - 2}),
                              i -> struct_pack(pos := i - 1, wh := {acc})))
                           AS w
                FROM hashed
            )
        )"""


def _substring_oracle(w: int = _SPAN_W) -> str:
    return f"""{_window_cte(w)},
        hot AS (
            SELECT whash FROM flat GROUP BY whash HAVING COUNT(*) > 1
        ),
        marked AS (
            SELECT f.doc_id, f.pos FROM flat f JOIN hot USING (whash)
        ),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= {w}
                        THEN 0 ELSE 1 END AS new_span
            FROM marked
        ),
        islands AS (
            SELECT doc_id, pos,
                   sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS span_id
            FROM flagged
        )
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {w} AS BIGINT) AS span_end,
               CAST(max(pos) + {w} - min(pos) AS BIGINT) AS span_tokens
        FROM islands
        GROUP BY doc_id, span_id
    """


@register(
    "dedup_substring_spans",
    oracle=_substring_oracle(),
    tags=("dedup", "text", "spans"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.dedup.substring import repeated_spans

    docs = load_table(spark, sf_dir, "documents")
    return repeated_spans(docs, w=_SPAN_W)


# --------------------------------------------------------------------------
# Blocked semantic dedup (dedup/semantic.py): IVF-cell blocking over
# the embedding space, exact within-cell cosine, SemDeDup-style pair
# emission. Registered round 4 in the slot freed by demoting
# json_extract_props (round-3 verdict #1).
#
# Oracle strategy: the k-means coarse quantizer is not reproducible in
# SQL, but the operator carries a PROVABLE identity — with full
# multi-assignment (n_assign = n_cells) every pair shares a cell, so
# the blocked result equals the exact all-pairs baseline by
# construction, while the ENTIRE scale machinery (centroid training,
# probe UDF, cell explode, per-cell join, multi-assign pair dedup,
# JVM-fold cosine) still executes and is hash-checked end to end. The
# production configuration (partial assignment, Σ|cell|² pair work)
# is pinned separately in tests/test_text_dedup.py: recall at
# n_assign ∈ {1, 2} and full-assignment ≡ exact.
# --------------------------------------------------------------------------
_SEM_THRESHOLD = 0.4
_SEM_CELLS = 4
_SEM_SIM = sql_cosine("a.v", "b.v")


@register(
    "dedup_semantic_pairs",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_SEM_SIM}, 6) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round({_SEM_SIM}, 6) >= {_SEM_THRESHOLD}
    """,
    tags=("vector", "dedup", "semantic"),
)
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_lake_spark.dedup.semantic import blocked_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return blocked_near_dup_pairs(
        emb,
        threshold=_SEM_THRESHOLD,
        n_cells=_SEM_CELLS,
        n_assign=_SEM_CELLS,
    )


# --------------------------------------------------------------------------
# Cross-corpus decontamination — registered round 4 in the slot freed
# by distinct_agg_per_status (whose exact-COUNT(DISTINCT) signal now
# rides on grouping_sets_revenue). The split makes it self-contained
# on the fixed tables: documents with doc_id % 20 == 0 play the
# "benchmark" corpus, the rest the training corpus.
# --------------------------------------------------------------------------
def _contamination_oracle(w: int = _SPAN_W) -> str:
    tk = f"list_filter({_TOK}, t -> t != '')"
    th = f"list_transform(tk, t -> {sql_poly_hash('t')})"
    acc = "th[i]"
    for j in range(1, w):
        acc = f"(({acc}) * 31 + th[i+{j}]) % {MOD}"
    return f"""
        WITH toks AS (
            SELECT doc_id, {tk} AS tk FROM documents
        ),
        hashed AS (
            SELECT doc_id, {th} AS th FROM toks
        ),
        flat AS (
            SELECT doc_id, w.pos AS pos, w.wh AS whash
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(th) - {w - 2}),
                              i -> struct_pack(pos := i - 1, wh := {acc})))
                           AS w
                FROM hashed
            )
        ),
        ref AS (
            SELECT DISTINCT whash FROM flat WHERE doc_id % 20 = 0
        ),
        marked AS (
            SELECT f.doc_id, f.pos
            FROM flat f JOIN ref USING (whash)
            WHERE f.doc_id % 20 != 0
        ),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= {w}
                        THEN 0 ELSE 1 END AS new_span
            FROM marked
        ),
        islands AS (
            SELECT doc_id, pos,
                   sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS span_id
            FROM flagged
        )
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {w} AS BIGINT) AS span_end,
               CAST(max(pos) + {w} - min(pos) AS BIGINT) AS span_tokens
        FROM islands
        GROUP BY doc_id, span_id
    """


# The catalog entry runs at w=4, not the substring-dedup default of 8:
# the synthetic corpus has almost no verbatim 8-gram train↔benchmark
# overlap (2 spans at sf0.01 — a near-empty hash check), while 4-grams
# yield ~51 spans whose gaps-and-islands merging is actually exercised.
# Production decontamination uses longer windows; the OPERATOR takes w
# as a parameter and the planted-leak tests pin w=8 behavior.
_CONTAM_W = 4
TEXT_CONTAMINATION_SPANS_SQL = _contamination_oracle(_CONTAM_W)


@register(
    "text_contamination_spans",
    oracle=TEXT_CONTAMINATION_SPANS_SQL,
    tags=("dedup", "contamination", "flagship"),
)
def text_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training↔benchmark verbatim-overlap spans
    (dedup/contamination.py) over the documents table, benchmark =
    every 20th doc. Oracle: TEXT_CONTAMINATION_SPANS_SQL."""
    from etl_data_lake_spark.dedup.contamination import contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 20 != 0)
    reference = docs.where(F.col("doc_id") % 20 == 0)
    return contaminated_spans(train, reference, w=_CONTAM_W)


# --------------------------------------------------------------------------
# Maximal pair-attributed matches (round 11, r10-verdict #4): the
# suffix-array-class variable-length form of exact-substring dedup
# (Lee et al. 2022) via the diagonal-run rewrite — see
# dedup/substring.maximal_match_spans for the maximality argument.
# The oracle replays the ENTIRE pipeline (not just the seed stage):
# window hashes → dup-occurrence prune → self-join → per-diagonal
# gaps-and-islands. Library twin (50-entry driver cap), parity-checked
# in test_parity::test_library_twin_parity. Run at w=4 like the
# contamination entry (the synthetic corpus has almost no verbatim
# 8-gram overlap); the operator default stays w=8 and the planted
# tests pin exact boundaries at varied lengths.
# --------------------------------------------------------------------------
def _maximal_match_ctes(w: int, max_occurrences: int) -> str:
    """The full pipeline up to a ``matches`` CTE — shared by the span
    diagnostic's oracle and the keep-first ACTION's (round 12)."""
    return f"""{_window_cte(w)},
        eligible AS (
            SELECT whash FROM flat GROUP BY whash
            HAVING COUNT(*) > 1 AND COUNT(*) <= {max_occurrences}
        ),
        dup AS (
            SELECT f.doc_id, f.pos, f.whash
            FROM flat f JOIN eligible USING (whash)
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS a_pos, b.pos AS b_pos,
                   a.pos - b.pos AS diag
            FROM dup a JOIN dup b USING (whash)
            WHERE a.doc_id < b.doc_id
               OR (a.doc_id = b.doc_id AND a.pos < b.pos)
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN a_pos - lag(a_pos) OVER
                            (PARTITION BY doc_a, doc_b, diag
                             ORDER BY a_pos) = 1
                        THEN 0 ELSE 1 END AS new_run
            FROM pairs
        ),
        runs AS (
            SELECT *,
                   sum(new_run) OVER (PARTITION BY doc_a, doc_b, diag
                                      ORDER BY a_pos
                                      ROWS UNBOUNDED PRECEDING) AS run_id
            FROM flagged
        ),
        matches AS (
            SELECT doc_a, doc_b,
                   CAST(min(a_pos) AS BIGINT) AS a_start,
                   CAST(max(a_pos) + {w} AS BIGINT) AS a_end,
                   CAST(min(b_pos) AS BIGINT) AS b_start,
                   CAST(max(b_pos) + {w} AS BIGINT) AS b_end,
                   CAST(max(a_pos) + {w} - min(a_pos) AS BIGINT)
                       AS match_tokens
            FROM runs
            GROUP BY doc_a, doc_b, diag, run_id
        )"""


def _maximal_match_oracle(w: int, max_occurrences: int) -> str:
    return f"""{_maximal_match_ctes(w, max_occurrences)}
        SELECT doc_a, doc_b, a_start, a_end, b_start, b_end, match_tokens
        FROM matches
    """


_MAXIMAL_W = 4
_MAXIMAL_CAP = 10_000
MAXIMAL_MATCH_SPANS_SQL = _maximal_match_oracle(_MAXIMAL_W, _MAXIMAL_CAP)


@register(
    "dedup_maximal_match_spans",
    oracle=MAXIMAL_MATCH_SPANS_SQL,
    tags=("dedup", "substring", "pairs"),
)
def dedup_maximal_match_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal variable-length verbatim matches between document pairs
    over the documents table. Oracle: MAXIMAL_MATCH_SPANS_SQL.
    Driver entry since round 11 (slot from text_token_frequencies)."""
    from etl_data_lake_spark.dedup.substring import maximal_match_spans

    docs = load_table(spark, sf_dir, "documents")
    return maximal_match_spans(
        docs, w=_MAXIMAL_W, max_occurrences=_MAXIMAL_CAP
    )


# --------------------------------------------------------------------------
# Keep-first repeated-substring dedup ACTION (promoted round 12, slot
# from text_simhash): the complete Lee et al. 2022 pipeline — maximal
# matches → b-side cut spans → excision, keeping the EARLIEST copy of
# every repeated substring. The oracle replays all three stages in SQL
# (the excise step is string-expressible: drop covered positions, re-
# join survivors in order). hasher='poly' EXPLICITLY: the operator's
# destructive default is xxhash64 (collision-resistant), but the
# oracle twin must share the SQL-replayable hash family — the
# documented poly-for-twins carve-out.
# --------------------------------------------------------------------------
_ACTION_MINLEN = 8  # excise only repeats of >= 8 tokens (w=4 detects
# them; the threshold stage is therefore exercised, not a no-op)


def _dedup_action_oracle(w: int, max_occurrences: int, min_length: int) -> str:
    return f"""{_maximal_match_ctes(w, max_occurrences)},
        cuts AS (
            SELECT DISTINCT doc_b AS doc_id, b_start AS span_start,
                            b_end AS span_end
            FROM matches WHERE match_tokens >= {min_length}
        ),
        cutdocs AS (SELECT DISTINCT doc_id FROM cuts),
        postoks AS (
            SELECT doc_id, w.pos AS pos, w.tok AS tok
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(tk) + 1),
                              i -> struct_pack(pos := i - 1, tok := tk[i])))
                           AS w
                FROM toks
                WHERE doc_id IN (SELECT doc_id FROM cutdocs)
            )
        ),
        kept AS (
            SELECT p.doc_id, p.pos, p.tok
            FROM postoks p
            WHERE NOT EXISTS (SELECT 1 FROM cuts c
                              WHERE c.doc_id = p.doc_id
                                AND p.pos >= c.span_start
                                AND p.pos < c.span_end)
        ),
        rebuilt AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS new_text
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CASE WHEN cd.doc_id IS NOT NULL
                    THEN COALESCE(r.new_text, '')
                    ELSE d.text END AS text
        FROM documents d
        LEFT JOIN cutdocs cd ON d.doc_id = cd.doc_id
        LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """


DEDUP_REPEATED_SUBSTRINGS_SQL = _dedup_action_oracle(
    _MAXIMAL_W, _MAXIMAL_CAP, _ACTION_MINLEN
)


@register(
    "dedup_repeated_substrings",
    oracle=DEDUP_REPEATED_SUBSTRINGS_SQL,
    tags=("dedup", "substring", "action"),
)
def dedup_repeated_substrings_action(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every occurrence of a >= 8-token repeated substring excised
    except the earliest (lowest doc id / earliest position); untouched
    documents keep their text byte-for-byte. Oracle:
    DEDUP_REPEATED_SUBSTRINGS_SQL. Driver entry since round 12."""
    from etl_data_lake_spark.dedup.substring import (
        dedup_repeated_substrings,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_repeated_substrings(
        docs,
        w=_MAXIMAL_W,
        min_length=_ACTION_MINLEN,
        hasher="poly",
        max_occurrences=_MAXIMAL_CAP,
    )


# --------------------------------------------------------------------------
# Corpus-level paragraph dedup (round 13, dedup/paragraphs.py): the
# Dolma-style keep-first paragraph ACTION replayed end-to-end in SQL —
# md5 exists on both engines, so the split/trim/digest/window/rebuild
# pipeline is exactly twinned. Library twin (50-entry driver cap),
# parity-checked in test_parity::test_library_twin_parity; rotation
# candidate for round 14.
# --------------------------------------------------------------------------

PARAGRAPH_DEDUP_SQL = """
    WITH p0 AS (
        SELECT doc_id, regexp_split_to_array(text, '\\n{2,}') AS paras
        FROM documents
    ),
    p AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(paras) + 1),
                      i -> {'para_idx': i - 1,
                            'para': regexp_replace(paras[i],
                                    '(^\\s+|\\s+$)', '', 'g')}),
                      recursive := true)
        FROM p0
    ),
    k AS (
        SELECT doc_id, para_idx, para,
               row_number() OVER (PARTITION BY md5(para)
                                  ORDER BY doc_id, para_idx) AS rn
        FROM p WHERE para != ''
    ),
    r AS (
        SELECT doc_id,
               string_agg(para, chr(10) || chr(10)
                          ORDER BY para_idx) AS new_text
        FROM k WHERE rn = 1 GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.new_text, '') AS text
    FROM documents d LEFT JOIN r USING (doc_id)
"""


def paragraph_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first corpus-wide paragraph dedup over the documents
    table. Oracle: PARAGRAPH_DEDUP_SQL (library twin)."""
    from etl_data_lake_spark.dedup.paragraphs import (
        drop_duplicate_paragraphs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return drop_duplicate_paragraphs(docs)
