"""Multimodal queries: binary media columns built from ``documents``.

No reference analog (its type surface stops at timestamp, SURVEY
§1.4); this is the training-data-pipeline extension. The FAKE1
container's header fields are pure functions of ``doc_id``
(multimodal.codec), so the DuckDB oracle recomputes arithmetically
what Spark extracts by actually decoding bytes inside a
``mapInPandas`` stage — the differential check covers the entire
binary round-trip: encode → shuffle-free decode → typed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.multimodal.codec import fake_media_table
from etl_data_lake_spark.multimodal.decode import (
    byte_histograms,
    decode_metadata,
    sample_frames,
)
from etl_data_lake_spark.queries.registry import register
from etl_data_lake_spark.sources.catalog import load_table

# doc_id → header fields, as SQL (must mirror codec.{kind,width,...}_of)
_KIND = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_WIDTH = "16 + (doc_id % 32) * 8"
_HEIGHT = "16 + (doc_id % 24) * 8"
_NFRAMES = f"CASE WHEN doc_id % 3 = 2 THEN 8 + doc_id % 40 ELSE 1 END"


@register(
    "media_decode_metadata",
    oracle=f"""
        SELECT doc_id AS media_id,
               {_KIND} AS kind,
               CAST({_WIDTH} AS INTEGER) AS width,
               CAST({_HEIGHT} AS INTEGER) AS height,
               CAST({_NFRAMES} AS INTEGER) AS n_frames,
               CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes
        FROM documents
    """,
    tags=("multimodal", "mapInPandas"),
)
def media_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header decode of every payload — width/height/frames/body size."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_metadata(fake_media_table(docs))


# Library twin since round 11 — its driver slot went to
# psi_drift_orders; the flatMap fan-out invariants stay pinned in
# test_multimodal and this exact query stays parity-checked in
# test_parity::test_library_twin_parity.
MEDIA_FRAME_SAMPLE_SQL = f"""
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(0, ({_NFRAMES}) - 1, 4)) AS INTEGER)
               AS frame_idx,
           CAST(GREATEST(octet_length(encode(text))
                         // GREATEST({_NFRAMES}, 1), 1) AS BIGINT)
               AS frame_bytes
    FROM documents
    WHERE doc_id % 3 = 2
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th frame of each video blob (flatMap-shaped fan-out)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(fake_media_table(docs), stride=4)


@register(
    "media_histogram_stats",
    oracle="""
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
    """,
    tags=("multimodal", "features"),
)
def media_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the histogram stage, reduced
    JVM-side. The oracle can't see the float features, so it pins the
    invariants the stage must preserve: per-kind media count and body
    volume — and ``total_bytes`` only comes out right if every
    histogram the Python stage emitted actually sums to 1 (rows with
    broken features are nulled out of the SUM and would mismatch)."""
    docs = load_table(spark, sf_dir, "documents")
    media = fake_media_table(docs)
    hists = byte_histograms(media, bins=16)
    sized = media.select(
        "media_id", "kind", (F.length("payload") - F.lit(18)).alias("body_bytes")
    )
    joined = sized.join(hists, "media_id").withColumn(
        "hist_sum", F.aggregate("histogram", F.lit(0.0), lambda a, x: a + x)
    )
    return joined.groupBy("kind").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum(
            F.when(
                F.col("hist_sum").between(0.999, 1.001)
                | (F.col("body_bytes") == 0),
                F.col("body_bytes"),
            )
        )
        .cast("long")
        .alias("total_bytes"),
    )


# Library twin since round 11 — its driver slot went to
# dsir_weights_docs; the audio framing invariants stay pinned in
# test_multimodal and this exact query stays parity-checked in
# test_parity::test_library_twin_parity (multimodal keeps two driver
# entries: media_decode_metadata + media_histogram_stats).
MEDIA_AUDIO_WINDOWS_SQL = """
    WITH a AS (
        SELECT doc_id, octet_length(encode(text)) AS nb
        FROM documents
        WHERE doc_id % 3 = 1 AND octet_length(encode(text)) > 0
    )
    SELECT doc_id AS media_id,
           CAST(CEIL(nb / 128.0) AS BIGINT) AS n_windows,
           CAST(CEIL(nb / 128.0) * (CEIL(nb / 128.0) - 1) / 2 AS BIGINT)
               AS idx_sum
    FROM a
"""


def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STFT-style audio framing (frame=256, hop=128) reduced to
    per-media invariants the oracle can recompute from payload size:
    window count = ceil(body/hop) and the 0..n-1 window-index sum.
    Windows only count if their decoded RMS and sample count are
    in-range, so a Python stage emitting garbage energies or
    mis-sliced windows breaks the match — the plumbing AND the
    framing math are both under test."""
    from etl_data_lake_spark.multimodal.decode import audio_windows

    docs = load_table(spark, sf_dir, "documents")
    wnd = audio_windows(fake_media_table(docs), frame=256, hop=128)
    valid = wnd.where(
        F.col("rms").between(0.0, 255.0) & F.col("n_samples").between(1, 256)
    )
    return valid.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum("window_idx").cast("long").alias("idx_sum"),
    )


def media_afp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only surface (round-13 verdict item #6): the audio
    fingerprint near-dup pipeline end to end — decode+FFT+hash over
    every audio clip (the kind filter prunes before decode), then the
    banded candidate join + exact Hamming verify. Correctness is
    pinned in tests/test_afp.py (banded ≡ brute force at three
    settings); this entry gives the multimodal family's last
    un-benched member a per-round cost anchor."""
    from etl_data_lake_spark.multimodal.afp import audio_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    media = fake_media_table(docs).select("media_id", "kind", "payload")
    return audio_near_dup_pairs(media, max_distance=3, bands=4)
