"""Batch ≡ stream equivalence — the streaming extension's contract
(SURVEY §7 step 7)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_tumbling_window_batch_equals_stream(spark):
    from etl_data_lake_spark.queries.golden import events_tumbling_window_1h
    from etl_data_lake_spark.streaming.events import (
        event_stream,
        run_available_now,
        tumbling_counts,
    )

    batch = {
        tuple(r)
        for r in events_tumbling_window_1h(spark, SF_DIR).collect()
    }
    stream_df = tumbling_counts(event_stream(spark, SF_DIR))
    got = {tuple(r) for r in run_available_now(stream_df, "tumble").collect()}
    assert got == batch


def test_stateful_sessionizer_closed_sessions_match_batch(spark):
    """applyInPandasWithState sessionizer: every CLOSED session the
    stream emits must match the batch sessionizer's (count per
    session); open sessions stay in state until timeout."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.operators.windows import sessionize
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.streaming.events import (
        event_stream,
        run_available_now,
        sessionize_stream,
    )

    events = load_table(spark, SF_DIR, "events")
    batch = {
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize(events, "user_id", "ts", 30)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    stream = sessionize_stream(event_stream(spark, SF_DIR), gap_minutes=30)
    got = {
        (r.user_id, r.session_id, r.n_events)
        for r in run_available_now(stream, "sess", output_mode="append").collect()
    }
    assert got, "stream emitted no closed sessions"
    assert got <= batch, f"stream emitted sessions batch doesn't have: {got - batch}"
    # most sessions close within the fixture's time range
    assert len(got) >= len(batch) * 0.5


def test_foreach_batch_upsert_latest_wins(spark, tmp_path):
    """Stream of user-level records with later corrections: the upsert
    sink keeps exactly one row per key — the newest."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_data_lake_spark.streaming.upsert import run_upsert_backfill

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("level", StringType()),
            StructField("updated_at", LongType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "level": "free", "updated_at": 100},
                {"user_id": 2, "level": "free", "updated_at": 100},
                {"user_id": 3, "level": "paid", "updated_at": 100},
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "level": "paid", "updated_at": 200},  # correction
                {"user_id": 4, "level": "free", "updated_at": 150},  # new key
            ]
        )
    )
    out = str(tmp_path / "users_table")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    run_upsert_backfill(stream, out, ["user_id"], "updated_at")

    got = {
        r.user_id: (r.level, r.updated_at)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        1: ("paid", 200),
        2: ("free", 100),
        3: ("paid", 100),
        4: ("free", 150),
    }


def test_stream_static_enrichment_batch_equals_stream(spark):
    """Stream-static broadcast enrichment: the same plan over a batch
    frame and an availableNow stream produces identical windowed
    per-segment aggregates, and no event is dropped by the left join."""
    from etl_data_lake_spark.sources.catalog import load_table
    from etl_data_lake_spark.streaming.events import (
        enriched_segment_counts,
        event_stream,
        run_available_now,
    )

    from pyspark.sql import functions as F

    customer = load_table(spark, SF_DIR, "customer")
    ev_batch = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        tuple(r)
        for r in enriched_segment_counts(ev_batch, customer).collect()
    }
    stream_df = enriched_segment_counts(event_stream(spark, SF_DIR), customer)
    got = {
        tuple(r)
        for r in run_available_now(
            stream_df, "enrich_seg", shuffle_partitions=8
        ).collect()
    }
    assert got == batch
    # nothing dropped: window x segment counts sum to the event count
    assert sum(r[2] for r in got) == ev_batch.count()
