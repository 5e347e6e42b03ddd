"""Multimodal plumbing tests: binary round-trip, batch shapes, fan-out,
and the DuckDB differential for the registered media queries."""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR


def _oracle_con():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_codec_roundtrip():
    from etl_data_lake_spark.multimodal.codec import decode_payload, encode_payload

    for doc_id, text in [(0, "hello"), (5, "äöü€ multibyte"), (14, "")]:
        kind, w, h, nf, body = decode_payload(encode_payload(doc_id, text))
        assert body.decode("utf-8") == text
        assert (kind == "video") == (doc_id % 3 == 2)
        assert nf >= 1 and w >= 16 and h >= 16
    with pytest.raises(ValueError):
        decode_payload(b"JPEG....not fake")


def test_real_decoder_is_gated():
    from etl_data_lake_spark.multimodal.codec import try_real_image_decode

    with pytest.raises(NotImplementedError):
        try_real_image_decode(b"\x89PNG")


def test_media_table_schema_and_payloads(spark):
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.sources.catalog import load_table

    media = fake_media_table(load_table(spark, SF_DIR, "documents"))
    assert dict(media.dtypes)["payload"] == "binary"
    rows = media.limit(5).collect()
    assert all(bytes(r.payload)[:5] == b"FAKE1" for r in rows)


def test_histograms_normalized(spark):
    from etl_data_lake_spark.multimodal import byte_histograms, fake_media_table
    from etl_data_lake_spark.sources.catalog import load_table

    media = fake_media_table(load_table(spark, SF_DIR, "documents"))
    hists = byte_histograms(media, bins=16).collect()
    assert len(hists) == media.count()
    for r in hists:
        assert len(r.histogram) == 16
        assert math.isclose(sum(r.histogram), 1.0, abs_tol=1e-3)


@pytest.mark.parametrize(
    "name",
    ["media_decode_metadata", "media_frame_sample", "media_histogram_stats"],
)
def test_media_queries_match_oracle(spark, name):
    from etl_data_lake_spark.queries.registry import oracle_sql, queries

    got = queries()[name](spark, SF_DIR).toPandas()
    con = _oracle_con()
    want = con.sql(oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w) and len(g) > 0
    for c in cols:
        assert list(g[c]) == list(w[c]), c


def test_resize_images_shapes(spark):
    from etl_data_lake_spark.multimodal import fake_media_table
    from etl_data_lake_spark.multimodal.decode import resize_images
    from etl_data_lake_spark.sources.catalog import load_table

    media = fake_media_table(load_table(spark, SF_DIR, "documents"))
    out = resize_images(media, target_w=8, target_h=8).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images > 0
    for r in out:
        assert (r.width, r.height) == (8, 8)
        assert len(bytes(r.body)) == 64
    # deterministic: same input -> identical bytes
    again = {r.media_id: bytes(r.body) for r in
             resize_images(media, target_w=8, target_h=8).collect()}
    assert all(again[r.media_id] == bytes(r.body) for r in out)


def test_audio_windows_framing_semantics(spark):
    """Exact framing on a crafted payload: 300 body bytes at
    (frame=256, hop=128) → windows [0:256], [128:300], [256:300] with
    known RMS values."""
    import math

    from etl_data_lake_spark.multimodal.codec import encode_payload, kind_of
    from etl_data_lake_spark.multimodal.decode import audio_windows

    # doc_id=1 is 'audio' (kind_of = doc_id % 3); body = 300 x 'a'
    assert kind_of(1) == "audio"
    payload = encode_payload(1, "a" * 300)
    media = spark.createDataFrame(
        [(1, "audio", 0, 0, 1, bytearray(payload))],
        "media_id long, kind string, width int, height int, n_frames int,"
        " payload binary",
    )
    rows = sorted(
        audio_windows(media, frame=256, hop=128).collect(),
        key=lambda r: r.window_idx,
    )
    assert [(r.window_idx, r.n_samples) for r in rows] == [
        (0, 256), (1, 172), (2, 44)
    ]
    # constant signal: RMS == the byte value for every window
    for r in rows:
        assert math.isclose(r.rms, float(ord("a")), rel_tol=1e-6)
