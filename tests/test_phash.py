"""Perceptual-hash image near-dup (multimodal/phash): dHash
determinism vs the pure function, banded candidate COMPLETENESS
(operator output == brute-force all-pairs at the guaranteed radius),
identical images at distance 0, the pigeonhole guard, and the
kind filter."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.multimodal.codec import (
    encode_payload,
    fake_media_table,
    kind_of,
)
from etl_data_lake_spark.multimodal.phash import (
    dhash_images,
    dhash_of_raster,
    image_near_dup_pairs,
    phash_near_dup_pairs,
)
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(120)
    return fake_media_table(docs)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_matches_pure_function(spark, media):
    got = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    rows = media.where(F.col("kind") == "image").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        body = bytes(r.payload)[18:]
        assert got[r.media_id] == dhash_of_raster(body, r.width, r.height)


def test_only_images_hashed(spark, media):
    ids = [r.media_id for r in dhash_images(media).collect()]
    assert ids and all(kind_of(i) == "image" for i in ids)


def test_identical_bodies_distance_zero(spark):
    # doc_ids 0 and 3 differ, but 0 % 32 == 32 % 32 etc — use two ids
    # with the SAME fake dims so identical text ⇒ identical raster:
    # width_of/height_of have period lcm(32,24)·? → ids 0 and 96 share
    # (doc_id % 32, doc_id % 24) and 96 % 3 == 0 keeps them images.
    rows = [(0, "same text body"), (96, "same text body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = fake_media_table(docs)
    pairs = image_near_dup_pairs(media, max_distance=0, bands=4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(0, 96, 0)]


def test_banded_candidates_are_complete(spark, media):
    """The guarantee, not a sample: at max_distance <= bands-1 the
    operator's output EQUALS the brute-force all-pairs answer."""
    hashes = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    ids = sorted(hashes)
    for bands, radius in ((4, 3), (8, 7), (16, 2)):
        want = sorted(
            (a, b, _hamming(hashes[a], hashes[b]))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if _hamming(hashes[a], hashes[b]) <= radius
        )
        got = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in image_near_dup_pairs(
                media, max_distance=radius, bands=bands
            ).collect()
        )
        assert got == want, (bands, radius)


def test_planted_near_duplicate_surfaces(spark):
    """Two rasters differing in a couple of sampled cells sit at a
    small Hamming distance and surface as a pair."""
    base = bytes(range(200)) * 40
    tweaked = bytearray(base)
    tweaked[0] = 255  # lands in a sampled grid cell
    d0 = dhash_of_raster(base, 80, 80)
    d1 = dhash_of_raster(bytes(tweaked), 80, 80)
    dist = _hamming(d0, d1)
    assert 0 < dist <= 3
    docs = spark.createDataFrame(
        [(0, base.decode("latin-1")), (96, bytes(tweaked).decode("latin-1"))],
        "doc_id long, text string",
    )
    # encode_payload utf-8-encodes; latin-1 round-trip inflates bytes,
    # so hash the known rasters directly instead
    hashes = spark.createDataFrame(
        [(0, d0), (1, d1)], "media_id long, dhash long"
    )
    pairs = phash_near_dup_pairs(hashes, max_distance=3, bands=4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(0, 1, dist)]
    assert docs.count() == 2  # fixture exercised


def test_pigeonhole_guard(spark, media):
    hashes = dhash_images(media)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(hashes, max_distance=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        phash_near_dup_pairs(hashes, max_distance=2, bands=5)


def test_negative_hash_bands_unsigned(spark):
    """A dhash with the sign bit set must band correctly —
    shiftrightunsigned, not shiftright (sign smear would merge every
    high band into one bucket)."""
    neg = int(np.uint64(0xF000000000000001).astype(np.int64))
    other = int(np.uint64(0xF000000000000003).astype(np.int64))
    hashes = spark.createDataFrame(
        [(1, neg), (2, other)], "media_id long, dhash long"
    )
    pairs = phash_near_dup_pairs(hashes, max_distance=1, bands=4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 2, 1)]


def test_fake_payload_roundtrip_consistency():
    text = "hello perceptual world"
    p = encode_payload(0, text)
    assert p[18:] == text.encode("utf-8")


# ---------------------------------------------------------------------------
# The decode seam (round 11, r10-verdict #9): operators consume images
# only through decoder(payload) -> (h, w) uint8 grid, so a real decode
# swaps at exactly one place — proven by driving the distributed
# operators end-to-end through an INJECTED non-FAKE1 decoder, and
# through PIL where PIL exists.
# ---------------------------------------------------------------------------


def _raw_media(spark, images):
    """(media_id, kind, payload) frame of RAW byte payloads — no FAKE1
    framing; only a seam-respecting decoder can read these."""
    return spark.createDataFrame(
        [(i, "image", bytearray(b)) for i, b in images],
        "media_id long, kind string, payload binary",
    )


def _raw_decoder(shape):
    h, w = shape

    def dec(payload: bytes):
        import numpy as np

        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w)

    return dec


def test_injected_decoder_drives_dhash_end_to_end(spark):
    import numpy as np

    from etl_data_lake_spark.multimodal.phash import (
        dhash_images,
        dhash_of_grid,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(12, 10), dtype=np.uint8)
    near = base.copy()
    near[0, 0] ^= 255  # flip one pixel — near-duplicate
    far = rng.integers(0, 256, size=(12, 10), dtype=np.uint8)
    imgs = [(1, base.tobytes()), (2, near.tobytes()), (3, far.tobytes())]
    media = _raw_media(spark, imgs)
    dec = _raw_decoder((12, 10))
    got = {
        r["media_id"]: r["dhash"]
        for r in dhash_images(media, decoder=dec).collect()
    }
    want = {i: dhash_of_grid(dec(b)) for i, b in imgs}
    assert got == want
    # the composed near-dup operator through the same seam
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(
            media, max_distance=3, bands=4, decoder=dec
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_injected_decoder_drives_resize_end_to_end(spark):
    import numpy as np

    from etl_data_lake_spark.multimodal.decode import resize_images

    grid = np.arange(48, dtype=np.uint8).reshape(6, 8)
    media = _raw_media(spark, [(1, grid.tobytes())])
    out = resize_images(
        media, target_w=4, target_h=3, decoder=_raw_decoder((6, 8))
    ).collect()
    assert len(out) == 1
    ys = np.arange(3) * 6 // 3
    xs = np.arange(4) * 8 // 4
    assert bytes(out[0].body) == grid[np.ix_(ys, xs)].tobytes()
    assert (out[0].width, out[0].height) == (4, 3)


def _has_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed")
def test_pil_decoder_drives_dhash_end_to_end(spark, tmp_path):
    """With PIL present, real PNG bytes flow through the same seam —
    the docstring's 'a real PIL decode swaps at one seam' as a test."""
    import io

    import numpy as np
    from PIL import Image

    from etl_data_lake_spark.multimodal.codec import pil_image_grid
    from etl_data_lake_spark.multimodal.phash import (
        dhash_images,
        dhash_of_grid,
    )

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    png = buf.getvalue()
    media = _raw_media(spark, [(1, png)])
    got = dhash_images(media, decoder=pil_image_grid).collect()
    assert got[0].dhash == dhash_of_grid(pil_image_grid(png))


@pytest.mark.skipif(_has_pil(), reason="PIL installed — gate can't fire")
def test_pil_decoder_gate_raises_loudly_without_pil():
    from etl_data_lake_spark.multimodal.codec import pil_image_grid

    with pytest.raises(NotImplementedError, match="PIL"):
        pil_image_grid(b"\x89PNG fake")
