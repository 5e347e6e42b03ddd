"""Perceptual-hash (dHash) image near-duplicate detection — the
multimodal member of the dedup family.

Text near-dup has MinHash+LSH (dedup/minhash.py); images get the same
candidates-first discipline over a 64-bit DIFFERENCE HASH (dHash, the
public gradient-hash construction: downsample to a 9×8 grid, emit one
bit per horizontally-adjacent pixel comparison). Visually-identical
images differ in a few bits; Hamming distance IS the similarity.

Scale shape — exactly minhash's, one level down:

* hashing is an Arrow-batched ``mapInPandas`` over the binary payload
  (the kind filter runs BEFORE decode and prunes parquet row groups);
* candidate generation is BANDING, not all-pairs: the 64-bit hash
  splits into ``bands`` equal segments; by pigeonhole, ANY pair with
  Hamming distance < bands matches exactly on at least one segment,
  so a per-band equi-self-join surfaces every qualifying pair —
  ``max_distance <= bands - 1`` is therefore a COMPLETENESS guarantee,
  enforced loudly, not a tuning knob;
* verification is ``bit_count(a XOR b) <= max_distance`` — pure JVM
  codegen on the candidate pairs, no Python, no payload access.

The shuffle carries (band, segment) keys and candidate pairs, never
the image bytes and never the cross product. Degenerate corpora
(thousands of byte-identical images) skew a band bucket exactly like
minhash's band buckets — the same salting/AQE-skew answers apply; the
verify cost is the bucket's pair count either way.

Raster convention matches decode.resize_images: the FAKE1 body is a
zero-padded w×h byte grid, nearest-neighbor sampled by integer index
(``arange(t)*dim//t``) — so the deterministic fake pipeline and a
real PIL-backed decode swap at one seam (the grid extraction), with
every distributed piece unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

HASH_BITS = 64

_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def dhash_of_grid(grid: "np.ndarray") -> int:
    """dHash of one (h, w) uint8 grayscale grid — the decoder-agnostic
    core: nearest-neighbor sample to a 9×8 grid, bit r*8+c =
    grid[r,c] > grid[r,c+1], packed MSB-first into a signed 64-bit int
    (two's complement — what a LongType column stores)."""
    h, w = grid.shape
    ys = np.arange(8) * h // 8
    xs = np.arange(9) * w // 9
    small = grid[np.ix_(ys, xs)].astype(np.int16)
    bits = (small[:, :-1] > small[:, 1:]).reshape(-1)  # (8, 8) → 64
    packed = np.packbits(bits)  # MSB-first, 8 bytes
    u = int.from_bytes(packed.tobytes(), "big")
    return int(np.uint64(u).astype(np.int64))


def dhash_of_raster(body: bytes, w: int, h: int) -> int:
    """Pure-Python/numpy dHash of one FAKE1 image body (the testable
    unit): zero-pad to w×h, then :func:`dhash_of_grid`."""
    raster = np.frombuffer(body, dtype=np.uint8)
    n = min(len(raster), w * h)
    grid = np.zeros(w * h, dtype=np.uint8)
    grid[:n] = raster[:n]
    return dhash_of_grid(grid.reshape(h, w))


def dhash_images(media: DataFrame, decoder=None) -> DataFrame:
    """→ (media_id, dhash long) for every ``kind == 'image'`` row.
    Arrow-batched decode+hash; payloads never leave the stage.
    ``decoder`` is the ONE decode seam (codec.py round-11 note):
    payload bytes → (h, w) uint8 grid; default = the FAKE1 stand-in
    (codec.fake_image_grid), swap codec.pil_image_grid (or any
    callable honoring the contract) for real image bytes — everything
    downstream of the grid is decoder-agnostic and test-pinned so."""
    from etl_data_lake_spark.multimodal.codec import fake_image_grid

    dec = decoder if decoder is not None else fake_image_grid

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                hashes.append(dhash_of_grid(dec(bytes(p))))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "dhash": pd.array(hashes, dtype="int64"),
                }
            )

    return (
        media.filter(media.kind == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, _DHASH_SCHEMA)
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """→ (id_a, id_b, hamming) with ``id_a < id_b`` for EVERY pair at
    Hamming distance ≤ ``max_distance`` — complete by the pigeonhole
    guarantee, which is why ``max_distance <= bands - 1`` is enforced:
    at distance ≥ bands a qualifying pair can differ in every band and
    silently vanish, and a dedup operator that silently drops
    duplicates is worse than none."""
    if bands < 1 or HASH_BITS % bands != 0:
        raise ValueError(
            f"bands must divide {HASH_BITS} evenly, got {bands}"
        )
    if not (0 <= max_distance <= bands - 1):
        raise ValueError(
            f"max_distance={max_distance} breaks the pigeonhole "
            f"completeness guarantee at bands={bands}; need "
            f"max_distance <= bands - 1 (raise bands for a wider radius)"
        )
    seg_bits = HASH_BITS // bands
    mask = (1 << seg_bits) - 1
    h = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    # ONE projection emits every band row (posexplode of the segment
    # array) — a per-band union would re-execute the upstream lineage
    # (a decode, typically) once per band.
    # shiftrightunsigned: the sign bit must not smear segments.
    segs = h.select(
        "_id",
        "_h",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_h"), b * seg_bits)
                    .bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_seg"),
    )
    a = segs.select(
        F.col("_band"),
        F.col("_seg"),
        F.col("_id").alias("id_a"),
        F.col("_h").alias("_ha"),
    )
    b_ = segs.select(
        F.col("_band"),
        F.col("_seg"),
        F.col("_id").alias("id_b"),
        F.col("_h").alias("_hb"),
    )
    cands = (
        a.join(b_, on=["_band", "_seg"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int"),
        )
        .where(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def image_near_dup_pairs(
    media: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    decoder=None,
) -> DataFrame:
    """The composed operator: hash every image, then banded
    candidate-join + exact verify. → (id_a, id_b, hamming). The hash
    table is checkpointed before pairing: the candidate self-join
    reads it from both sides, and without materialization each side
    would re-run the whole decode+hash scan. ``decoder`` passes
    through to :func:`dhash_images` (the one decode seam)."""
    hashes = dhash_images(media, decoder=decoder).localCheckpoint()
    return phash_near_dup_pairs(
        hashes, max_distance=max_distance, bands=bands
    )
