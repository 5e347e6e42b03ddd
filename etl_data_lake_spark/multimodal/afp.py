"""Audio fingerprint near-duplicate detection — the audio member of
the dedup family (round 12, r11-verdict #6).

The construction is the public spectral-fingerprint recipe
(Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprinting
System"; chromaprint descends from it): frame the signal, take
per-frame band energies, and emit SIGN-OF-DIFFERENCE bits — energy
gradients survive volume changes, re-encoding, and mild noise, while
absolute energies don't. Here the spectrogram is nearest-neighbor
pooled to a fixed 8(time)×9(frequency) grid and the bits are the 64
frequency-adjacent comparisons — exactly the dHash gradient-bit
layout, so a clip's fingerprint is one 64-bit long and the WHOLE
candidate machinery is shared verbatim with image phash:

* banding + per-band equi-self-join for candidates (pigeonhole
  completeness: ``max_distance <= bands - 1`` enforced loudly);
* ``bit_count(a XOR b) <= max_distance`` JVM verify;
* shuffle carries (band, segment) keys and pairs — never payloads,
  never the cross product.

Decoder seam (codec.py's round-11 discipline): ``decoder`` maps
payload bytes → 1-D float64 sample array; the default treats the
FAKE1 body as unsigned 8-bit PCM (audio_windows' stand-in), a real
pipeline swaps in soundfile/librosa AT THAT ONE SEAM and every
distributed piece — framing, FFT, pooling, banding, verify — is
unchanged and stays test-pinned.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from etl_data_lake_spark.multimodal.phash import phash_near_dup_pairs

T_BINS = 8   # time buckets
F_BINS = 9   # frequency buckets → 8 gradient bits per time bucket

_AFP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("afp", LongType()),
    ]
)


def fake_audio_samples(payload: bytes) -> np.ndarray:
    """Default decode seam: FAKE1 body bytes as unsigned 8-bit PCM
    (the same stand-in convention as decode.audio_windows)."""
    from etl_data_lake_spark.multimodal.codec import decode_payload

    _kind, _w, _h, _nf, body = decode_payload(payload)
    return np.frombuffer(body, dtype=np.uint8).astype(np.float64)


def afp_of_samples(
    samples: np.ndarray, frame: int = 256, hop: int = 128
) -> int:
    """64-bit spectral fingerprint of one sample array — the
    decoder-agnostic, pure-numpy core (the testable unit):

    1. frame into windows every ``hop`` samples, ``frame`` long
       (tail zero-padded — same framing walk as audio_windows);
    2. per window: rFFT power spectrum;
    3. nearest-neighbor pool the (n_windows × n_rfft) spectrogram to
       a (8 × 9) grid (the integer-index ``arange(t)*n//t`` sampling
       phash's raster path uses);
    4. bit r*8+c = grid[r, c] > grid[r, c+1], packed MSB-first into a
       signed 64-bit int (two's complement — a LongType column).

    Empty/short clips zero-pad: all-equal energies compare False
    everywhere, giving the stable all-zeros fingerprint."""
    if frame < 2 or hop < 1:
        raise ValueError(f"need frame >= 2 and hop >= 1, got {frame}/{hop}")
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    n_windows = max(1, -(-len(x) // hop))  # ceil, >= 1 so the grid exists
    spec = np.zeros((n_windows, frame // 2 + 1), dtype=np.float64)
    for i in range(n_windows):
        wnd = x[i * hop : i * hop + frame]
        if len(wnd) < frame:
            wnd = np.pad(wnd, (0, frame - len(wnd)))
        mag = np.fft.rfft(wnd)
        spec[i] = (mag.real * mag.real) + (mag.imag * mag.imag)
    ts = np.arange(T_BINS) * n_windows // T_BINS
    fs = np.arange(F_BINS) * spec.shape[1] // F_BINS
    grid = spec[np.ix_(ts, fs)]
    bits = (grid[:, :-1] > grid[:, 1:]).reshape(-1)  # (8, 8) → 64
    packed = np.packbits(bits)
    u = int.from_bytes(packed.tobytes(), "big")
    return int(np.uint64(u).astype(np.int64))


def audio_fingerprints(
    media: DataFrame,
    frame: int = 256,
    hop: int = 128,
    decoder=None,
) -> DataFrame:
    """→ (media_id, afp long) for every ``kind == 'audio'`` row.
    Arrow-batched decode+FFT+hash; payloads never leave the stage (the
    kind filter runs BEFORE decode and prunes parquet row groups)."""
    dec = decoder if decoder is not None else fake_audio_samples

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                ids.append(int(mid))
                fps.append(afp_of_samples(dec(bytes(p)), frame, hop))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "afp": pd.array(fps, dtype="int64"),
                }
            )

    return (
        media.filter(media.kind == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, _AFP_SCHEMA)
    )


def audio_near_dup_pairs(
    media: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    frame: int = 256,
    hop: int = 128,
    decoder=None,
) -> DataFrame:
    """The composed operator: fingerprint every audio clip, then
    banded candidate-join + exact Hamming verify — (id_a, id_b,
    hamming) with id_a < id_b, COMPLETE at distance ≤ ``max_distance``
    by the pigeonhole guarantee (phash_near_dup_pairs enforces
    ``max_distance <= bands - 1``). The fingerprint table is
    checkpointed before pairing so the self-join doesn't re-run the
    decode+FFT scan from both sides."""
    fps = audio_fingerprints(
        media, frame=frame, hop=hop, decoder=decoder
    ).localCheckpoint()
    return phash_near_dup_pairs(
        fps, max_distance=max_distance, bands=bands,
        id_col="media_id", hash_col="afp",
    )
