"""Plan-shape assertions: the scale claims hold on the actual physical
plans, checked via etl_data_lake_spark.plans."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_dim_joins_broadcast(spark):
    from etl_data_lake_spark.plans import assert_broadcast_join
    from etl_data_lake_spark.queries.registry import queries

    q = queries()["q01_top_parts_by_lineitems"](spark, SF_DIR)
    assert_broadcast_join(q)


def test_filters_reach_parquet_scan(spark):
    from pyspark.sql import functions as F

    from etl_data_lake_spark.plans import explain_report
    from etl_data_lake_spark.sources.catalog import load_table

    df = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    rep = explain_report(df)
    assert any("o_orderstatus" in p for p in rep.pushed_filters), rep.pushed_filters
    # column pruning: the scan reads only what the query touches
    assert rep.scan_schemas and "o_orderpriority" not in rep.scan_schemas[0]


def test_bucketed_join_report_no_exchange(spark, tmp_path):
    from etl_data_lake_spark.plans import assert_no_exchange
    from etl_data_lake_spark.sources.bucketed import drop_table, write_bucketed
    from etl_data_lake_spark.sources.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            orders.withColumnRenamed("o_custkey", "k"),
            "ord_p", str(tmp_path / "o"), ["k"], buckets=4,
        )
        grouped = spark.table("ord_p").groupBy("k").count()
        # aggregation on the bucket key needs no shuffle either
        assert_no_exchange(grouped)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        drop_table(spark, "ord_p")


def test_bloom_runtime_filter_injected(spark):
    """Runtime bloom-filter join pruning: a selective filter on the dim
    side of a shuffle join must inject bloom_filter_might_contain on
    the fact scan — at 100 TB the bloom filter rejects fact rows
    BEFORE the shuffle, the single biggest scan-reduction Spark offers
    a non-partition-key join. Thresholds are floored so sf-test sizes
    qualify; the mechanism under test is the same."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        lineitem = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").where(
            F.col("o_orderstatus") == "P"  # selective: ~4% of orders
        )
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).select("l_orderkey", "l_extendedprice", "o_orderstatus")
        # the injected filter renders as might_contain(bloom subquery) on
        # the fact side; assert on the optimized plan, where the
        # bloom_filter_agg creation side is visible too
        opt = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt, opt
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning(spark, tmp_path):
    """Hive-partitioned fact ⋈ dim filtered on a NON-join column must
    plan a dynamicpruning subquery in the fact scan's PartitionFilters:
    the partitions to read are decided at runtime from the dim's rows.
    This is THE mechanism that makes date-partitioned 100 TB tables
    queryable — scan cost follows the dim predicate, not the table
    size. (A literal filter on the join column itself is propagated
    STATICALLY into PartitionFilters — also verified — so DPP is
    exercised with a filter only the dim's data can resolve.)"""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.sources.sinks import write_partitioned

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ("event_type",))
    fact = spark.read.parquet(path)
    # static propagation case: literal predicate on the join column
    lit_dim = events.select("event_type").distinct().where(
        F.col("event_type") == "purchase"
    )
    lit_plan = plan_string(
        fact.join(F.broadcast(lit_dim), "event_type").select("event_id"),
        "formatted",
    )
    import re

    assert re.search(r"PartitionFilters:.*purchase", lit_plan), lit_plan
    # runtime case: the qualifying types are derivable only from data
    dyn_dim = (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 100)
    )
    joined = fact.join(F.broadcast(dyn_dim), "event_type").select(
        "event_id", "event_type"
    )
    plan = plan_string(joined, "formatted")
    assert "dynamicpruning" in plan.lower(), plan


def test_deterministic_split_is_exchange_free(spark):
    """split_deterministic is a pure filter per split — the plan must
    contain NO Exchange (the whole point: train/val/test selection at
    scan speed on 100 TB, zero shuffle). Same for the sampler."""
    from etl_data_lake_spark.operators.sampling import (
        sample_deterministic,
        split_deterministic,
    )
    from etl_data_lake_spark.plans import assert_no_exchange
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    splits = split_deterministic(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, ("doc_id",)
    )
    for part in splits.values():
        assert_no_exchange(part.select("doc_id"))
    assert_no_exchange(
        sample_deterministic(docs, 0.25, ("doc_id",)).select("doc_id")
    )


def test_mixture_resample_broadcasts_thresholds(spark):
    """resample_to_mixture's kept-row side is a broadcast join of
    #strata threshold rows onto the corpus scan — the corpus itself
    must never hash-exchange (the 100 TB claim in sampling.py). The
    only Exchanges allowed belong to the tiny counts/solver subplan
    (post-aggregation, #strata rows)."""
    from etl_data_lake_spark.operators.sampling import resample_to_mixture
    from etl_data_lake_spark.plans import assert_broadcast_join, plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    kept = resample_to_mixture(
        docs,
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        "source",
        ("doc_id",),
    )
    assert_broadcast_join(kept)
    plan = plan_string(kept.select("doc_id"), "executed")
    # no SortMergeJoin / ShuffledHashJoin anywhere: the corpus-sized
    # probe side reaches the broadcast join straight from its scan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_chunking_is_exchange_free(spark):
    """chunk_documents is a per-row flatMap (sequence/explode/
    substring, pure codegen): the plan must contain NO Exchange and
    no Python evaluation node — chunking 100 TB runs at scan speed."""
    from etl_data_lake_spark.operators.chunking import chunk_documents
    from etl_data_lake_spark.plans import assert_no_exchange, plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    chunks = chunk_documents(docs, 200, overlap=20)
    assert_no_exchange(chunks.select("doc_id", "chunk_idx"))
    plan = plan_string(chunks, "executed")
    assert "Python" not in plan  # no UDF anywhere in the hot path


def test_cap_per_stratum_single_stratum_shuffle(spark):
    """cap_per_stratum is one stratum-partitioned window: exactly one
    Exchange (on the stratum), no join, no extra sort beyond the
    window's own."""
    from etl_data_lake_spark.operators.sampling import cap_per_stratum
    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    capped = cap_per_stratum(docs, 10, "source", ("doc_id",))
    plan = plan_string(capped.select("doc_id"), "executed")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_packing_single_shuffle_on_shard(spark):
    """pack_sequences co-locates shards with exactly ONE Exchange (the
    groupBy(_shard) for applyInPandas) — no hidden extra shuffles."""
    from etl_data_lake_spark.operators.packing import pack_sequences
    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    packed = pack_sequences(docs, "n_chars", 1200, n_shards=8)
    # executed mode: each physical node prints once (formatted repeats
    # node names in the per-node detail section)
    plan = plan_string(packed.select("doc_id", "pack_id"), "executed")
    assert plan.count("Exchange") == 1, plan


def test_maximal_match_plan_is_equi_join(spark):
    """maximal_match_spans' self-join runs on the whash equality key —
    no BroadcastNestedLoop, no CartesianProduct anywhere in the plan
    (the canonical pair-generation cliff)."""
    from etl_data_lake_spark.dedup.substring import maximal_match_spans
    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_string(maximal_match_spans(docs, w=4), "executed")
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan


def test_dsir_ratio_table_broadcasts(spark):
    """dsir_log_weights joins the ≤ buckets-row log-ratio table as a
    BROADCAST — the pool-side feature table must never shuffle for
    the scoring join."""
    from etl_data_lake_spark.operators.dsir import dsir_log_weights
    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    w = dsir_log_weights(
        docs.where(F.col("doc_id") % 7 != 0),
        docs.where(F.col("doc_id") % 7 == 0),
        buckets=512,
    )
    plan = plan_string(w, "executed")
    assert "BroadcastHashJoin" in plan, plan


def test_embedding_cell_histogram_no_join_no_vector_shuffle(spark):
    """The cell histogram is one Arrow scan + a ≤ k-row aggregate: no
    join at all, and the single Exchange carries the (bucket, count)
    partials, never vectors."""
    from etl_data_lake_spark.operators.embedding_drift import (
        embedding_cell_histogram,
    )
    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.similarity.kmeans import kmeans_fit
    from etl_data_lake_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cells, _ = kmeans_fit(emb.limit(64), 4, "vec_id", "embedding")
    plan = plan_string(embedding_cell_histogram(emb, cells), "executed")
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_dedup_action_excision_never_cartesian(spark):
    """The round-12 driver entry's full pipeline — maximal matches →
    cuts → excision — stays equi-keyed end to end: the span anti-join
    in excise_spans keys on the doc id, so no BroadcastNestedLoop over
    the corpus and no Cartesian anywhere."""
    from etl_data_lake_spark.queries.registry import queries
    from etl_data_lake_spark.plans import plan_string

    q = queries()["dedup_repeated_substrings"](spark, SF_DIR)
    plan = plan_string(q, "executed")
    assert "Cartesian" not in plan, plan


def test_urls_domain_stats_single_agg_no_join(spark):
    """domain_stats is ONE hash aggregation over the scan (plus the
    k-row global-share window) — no join, and the only exchanges key
    the domain aggregate / the tiny window, never a second corpus
    pass."""
    from etl_data_lake_spark.functions.urls import domain_stats
    from etl_data_lake_spark.plans import plan_string
    from etl_data_lake_spark.queries.curation_ops import doc_urls
    from etl_data_lake_spark.sources.catalog import load_table

    docs = doc_urls(load_table(spark, SF_DIR, "documents"))
    plan = plan_string(domain_stats(docs, url_col="url"), "executed")
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan
