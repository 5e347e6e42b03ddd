"""Audio fingerprint near-dup (multimodal/afp, round 12): fingerprint
determinism vs the pure function, banded candidate COMPLETENESS
(operator output == brute-force all-pairs at three settings),
identical clips at distance 0, the pigeonhole guard, robustness of
the gradient bits to volume scaling, and the kind filter."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.multimodal.afp import (
    afp_of_samples,
    audio_fingerprints,
    audio_near_dup_pairs,
    fake_audio_samples,
)
from etl_data_lake_spark.multimodal.codec import fake_media_table
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    return fake_media_table(docs)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprints_match_pure_function(spark, media):
    got = {r.media_id: r.afp for r in audio_fingerprints(media).collect()}
    rows = media.where(F.col("kind") == "audio").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        want = afp_of_samples(fake_audio_samples(bytes(r.payload)))
        assert got[r.media_id] == want


def test_kind_filter_only_audio(spark, media):
    n_audio = media.where(F.col("kind") == "audio").count()
    assert audio_fingerprints(media).count() == n_audio


@pytest.mark.parametrize("max_distance,bands", [(1, 2), (3, 4), (7, 8)])
def test_banded_pairs_equal_bruteforce(spark, media, max_distance, bands):
    """Completeness at three settings: the banded operator must emit
    EXACTLY the all-pairs result at the guaranteed radius."""
    fps = {r.media_id: r.afp for r in audio_fingerprints(media).collect()}
    ids = sorted(fps)
    want = {
        (a, b, _hamming(fps[a], fps[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _hamming(fps[a], fps[b]) <= max_distance
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in audio_near_dup_pairs(
            media, max_distance=max_distance, bands=bands
        ).collect()
    }
    assert got == want
    assert len(want) > 0 or max_distance == 1  # settings 2/3 must bite


def test_identical_clips_distance_zero(spark, media):
    one = media.where(F.col("kind") == "audio").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(one.media_id + 1_000_000, one.kind, bytearray(one.payload))],
        "media_id long, kind string, payload binary",
    )
    both = media.select("media_id", "kind", "payload").union(dup)
    pairs = audio_near_dup_pairs(both, max_distance=1, bands=2).collect()
    hit = [
        r for r in pairs
        if r.id_a == one.media_id and r.id_b == one.media_id + 1_000_000
    ]
    assert len(hit) == 1 and hit[0].hamming == 0


def test_gradient_bits_survive_volume_scaling():
    """The Haitsma–Kalker point: energy GRADIENT signs are invariant
    to a global gain change, absolute energies are not."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=4000)
    assert afp_of_samples(x) == afp_of_samples(3.5 * x)
    assert afp_of_samples(x) == afp_of_samples(0.1 * x)


def test_pure_function_edges_and_validation():
    # empty and short clips: stable all-zeros fingerprint, no crash
    assert afp_of_samples(np.array([])) == 0
    assert afp_of_samples(np.zeros(10)) == 0
    with pytest.raises(ValueError, match="frame >= 2"):
        afp_of_samples(np.zeros(10), frame=1)
    # pigeonhole guard rides phash's (shared code path)
    with pytest.raises(ValueError, match="pigeonhole"):
        from etl_data_lake_spark.multimodal.phash import (
            phash_near_dup_pairs,
        )

        phash_near_dup_pairs(
            None, max_distance=4, bands=4, id_col="media_id",
            hash_col="afp",
        )


def test_decoder_seam_injected(spark, media):
    """A foreign decoder (raw bytes as int16 PCM) flows through the one
    seam; the distributed result equals the pure function under the
    SAME decoder."""

    def raw_i16(payload: bytes) -> np.ndarray:
        b = payload[: (len(payload) // 2) * 2]
        return np.frombuffer(b, dtype=np.int16).astype(np.float64)

    got = {
        r.media_id: r.afp
        for r in audio_fingerprints(media, decoder=raw_i16).collect()
    }
    rows = media.where(F.col("kind") == "audio").collect()
    for r in rows:
        assert got[r.media_id] == afp_of_samples(raw_i16(bytes(r.payload)))
