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


# media_frame_sample is a library twin since round 11 (driver slot went
# to psi_drift_orders) — its oracle check moved to
# test_parity::test_library_twin_parity[media_frame_sample].
@pytest.mark.parametrize(
    "name",
    ["media_decode_metadata", "media_histogram_stats"],
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


def test_select_keyframes_exact_semantics(spark):
    """Crafted 6-frame video with frame means [10,10,50,50,50,10],
    gop=2, threshold=8 → kept: 0(first), 2(scene_change, +40),
    4(gop cadence), 5(scene_change, −40). Frame 1 and 3 are within
    both bounds and must be dropped."""
    import struct

    from etl_data_lake_spark.multimodal.codec import FAKE_MAGIC
    from etl_data_lake_spark.multimodal.decode import select_keyframes

    body = bytes([10] * 8 + [50] * 12 + [10] * 4)  # 6 frames x 4 bytes
    payload = FAKE_MAGIC + bytes([2]) + struct.pack("<iii", 16, 16, 6) + body
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload)), (8, "image", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    rows = sorted(
        select_keyframes(media, gop=2, threshold=8.0).collect(),
        key=lambda r: r.frame_idx,
    )
    # the image row must be filtered out before decode
    assert {r.media_id for r in rows} == {7}
    assert [(r.frame_idx, r.reason) for r in rows] == [
        (0, "first"),
        (2, "scene_change"),
        (4, "gop"),
        (5, "scene_change"),
    ]
    assert [round(r.signature) for r in rows] == [10, 50, 50, 10]


def test_select_keyframes_invariants_on_corpus(spark):
    """Over the generated media table: every video emits frame 0 as
    'first'; consecutive kept frames are never more than gop apart;
    every scene_change kept frame moved >= threshold from the last
    kept signature."""
    from etl_data_lake_spark.multimodal.codec import fake_media_table
    from etl_data_lake_spark.multimodal.decode import select_keyframes
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(300)
    media = fake_media_table(docs)
    gop, threshold = 4, 6.0
    kept = select_keyframes(media, gop=gop, threshold=threshold).collect()
    by_vid: dict[int, list] = {}
    for r in kept:
        by_vid.setdefault(r.media_id, []).append(r)
    assert by_vid, "corpus contains videos"
    for vid, rows in by_vid.items():
        rows.sort(key=lambda r: r.frame_idx)
        assert rows[0].frame_idx == 0 and rows[0].reason == "first"
        for prev, cur in zip(rows, rows[1:]):
            assert cur.frame_idx - prev.frame_idx <= gop
            if cur.reason == "scene_change":
                assert abs(cur.signature - prev.signature) >= threshold - 1e-6


def test_media_features_feed_ann_end_to_end(spark):
    """Composition: binary payloads → Arrow-batched feature extraction
    (byte histograms) → PCA compression → brute-force cosine top-k.
    The multimodal features are plain attribute columns, so the whole
    media→embedding→ANN pipeline chains without re-materialization —
    and a payload's nearest neighbor under byte-histogram features is
    deterministic and layout-invariant."""
    from pyspark.sql import functions as F

    from etl_data_lake_spark.multimodal.codec import fake_media_table
    from etl_data_lake_spark.multimodal.decode import byte_histograms
    from etl_data_lake_spark.similarity.bruteforce import cosine_topk
    from etl_data_lake_spark.similarity.pca import pca_fit, pca_transform
    from etl_data_lake_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    feats = byte_histograms(fake_media_table(docs), bins=16).select(
        F.col("media_id").alias("vec_id"),
        F.col("histogram").alias("embedding"),
    )
    model = pca_fit(feats, "embedding", k=8)
    compressed = pca_transform(feats, model, "embedding", "z").select(
        "vec_id", F.col("z").alias("embedding")
    )
    queries = compressed.where(F.col("vec_id") < 5)
    nn = cosine_topk(compressed, queries, k=3)
    rows = nn.collect()
    assert {r["query_id"] for r in rows} == set(range(5))
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
    again = cosine_topk(compressed.repartition(7), queries, k=3).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}
