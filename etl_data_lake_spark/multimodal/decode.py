"""Decode / feature-extract / frame-sample over binary media columns.

All three stages are Arrow-batched ``mapInPandas`` transforms — the
idiomatic Spark shape for opaque-binary work: the JVM never inspects
the payload, Python sees whole columnar batches (not rows), and the
output schema is declared up front so Catalyst can plan around the
stage. Filters on ``kind``/metadata run BEFORE these stages and are
pushed to the parquet scan when media is stored; payloads are dropped
from the output so nothing heavy crosses the next shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_data_lake_spark.multimodal.codec import decode_payload

_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("body_bytes", LongType()),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Parse every payload's container header (the stand-in for a real
    image/audio header read) and emit typed metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": [d[0] for d in decoded],
                    "width": pd.array([d[1] for d in decoded], dtype="int32"),
                    "height": pd.array([d[2] for d in decoded], dtype="int32"),
                    "n_frames": pd.array([d[3] for d in decoded], dtype="int32"),
                    "body_bytes": pd.array(
                        [len(d[4]) for d in decoded], dtype="int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, _META_SCHEMA)


_HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("histogram", ArrayType(FloatType())),
    ]
)


def byte_histograms(media: DataFrame, bins: int = 16) -> DataFrame:
    """Normalized byte-value histogram of each payload body — the
    feature-extraction stand-in (a real pipeline would emit CLIP/mel
    features here). numpy over the whole batch, no per-row Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            for p in pdf["payload"]:
                body = np.frombuffer(bytes(p), dtype=np.uint8)[18:]
                h = np.bincount(body >> int(np.log2(256 // bins)), minlength=bins)
                total = max(int(h.sum()), 1)
                hists.append((h / total).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "histogram": hists}
            )

    return media.select("media_id", "payload").mapInPandas(fn, _HIST_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Every ``stride``-th frame of each video payload (fan-out: one
    input row → many frame rows, the mapInPandas analogue of a
    flatMap). Non-video rows are filtered out BEFORE decode — at scale
    this predicate prunes whole parquet row groups."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id: list[int] = []
            out_idx: list[int] = []
            out_len: list[int] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                kind, _w, _h, n_frames, body = decode_payload(bytes(p))
                per_frame = max(len(body) // max(n_frames, 1), 1)
                for i in range(0, n_frames, stride):
                    out_id.append(int(mid))
                    out_idx.append(i)
                    out_len.append(per_frame)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out_id, dtype="int64"),
                    "frame_idx": pd.array(out_idx, dtype="int32"),
                    "frame_bytes": pd.array(out_len, dtype="int64"),
                }
            )

    return (
        media.filter(media.kind == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, _FRAME_SCHEMA)
    )


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("body", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 16, target_h: int = 16, decoder=None
) -> DataFrame:
    """Deterministic image 'resize': decode to a grayscale grid and
    nearest-neighbor sample it down to (target_w, target_h).
    ``decoder`` is the ONE decode seam (payload bytes → (h, w) uint8
    grid; codec.py round-11 note): default = the FAKE1 stand-in
    (codec.fake_image_grid), swap codec.pil_image_grid for real image
    bytes — the kind filter BEFORE decode, the Arrow batch shape, and
    the declared binary output schema are decoder-agnostic production
    plumbing, test-pinned through an injected decoder.
    """
    from etl_data_lake_spark.multimodal.codec import fake_image_grid

    dec = decoder if decoder is not None else fake_image_grid

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"media_id": [], "width": [], "height": [], "body": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                grid = dec(bytes(p))
                h, w = grid.shape
                ys = (np.arange(target_h) * h // target_h) if h else []
                xs = (np.arange(target_w) * w // target_w) if w else []
                small = grid[np.ix_(ys, xs)] if h and w else np.zeros((0, 0))
                out_rows["media_id"].append(int(mid))
                out_rows["width"].append(target_w)
                out_rows["height"].append(target_h)
                out_rows["body"].append(small.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out_rows["media_id"], dtype="int64"),
                    "width": pd.array(out_rows["width"], dtype="int32"),
                    "height": pd.array(out_rows["height"], dtype="int32"),
                    "body": out_rows["body"],
                }
            )

    return (
        media.filter(media.kind == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, _RESIZE_SCHEMA)
    )


_KEYFRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("signature", FloatType()),
        StructField("reason", StringType()),
    ]
)


def select_keyframes(
    media: DataFrame, gop: int = 8, threshold: float = 8.0
) -> DataFrame:
    """GOP-style keyframe selection per video payload: keep frame 0,
    every frame whose content signature jumps ≥ ``threshold`` from the
    last KEPT frame (scene change), and a forced keyframe every ``gop``
    frames since the last kept one (bounded seek distance, the I-frame
    cadence contract of real codecs). Emits (frame_idx, signature,
    reason ∈ first|scene_change|gop).

    The stand-in signature is the frame slice's mean byte value; a real
    pipeline swaps it for a perceptual hash / histogram distance on the
    decoded frame — the sequential kept-frame scan, the kind filter
    BEFORE decode, and the fan-out row shape are the production
    plumbing. The scan is per-video sequential by nature (each decision
    depends on the last KEPT frame, not a fixed lag, so it is not a
    window function) but videos parallelize across the corpus — the
    scale axis is |videos|, and a video's frame count is codec-bounded.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "signature": [], "reason": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _kind, _w, _h, n_frames, body = decode_payload(bytes(p))
                raw = np.frombuffer(body, dtype=np.uint8)
                per_frame = max(len(raw) // max(n_frames, 1), 1)
                sigs = [
                    float(seg.mean()) if len(seg := raw[i * per_frame : (i + 1) * per_frame]) else 0.0
                    for i in range(n_frames)
                ]
                last_kept_idx, last_kept_sig = -1, 0.0
                for i, sig in enumerate(sigs):
                    if last_kept_idx < 0:
                        reason = "first"
                    elif abs(sig - last_kept_sig) >= threshold:
                        reason = "scene_change"
                    elif i - last_kept_idx >= gop:
                        reason = "gop"
                    else:
                        continue
                    last_kept_idx, last_kept_sig = i, sig
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["signature"].append(sig)
                    out["reason"].append(reason)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "signature": pd.array(out["signature"], dtype="float32"),
                    "reason": out["reason"],
                }
            )

    return (
        media.filter(media.kind == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, _KEYFRAME_SCHEMA)
    )


_AUDIO_WIN_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", FloatType()),
    ]
)


def audio_windows(media: DataFrame, frame: int = 256, hop: int = 128) -> DataFrame:
    """Overlapping fixed-size sample windows per audio payload (the
    STFT-style framing every audio feature extractor starts with):
    windows start every ``hop`` bytes, take up to ``frame`` samples
    (tail windows truncate), and carry their RMS energy. So
    n_windows = ceil(body_bytes / hop) — an invariant an external
    oracle can compute from the payload size alone. The stand-in
    treats body bytes as unsigned 8-bit PCM; a real pipeline swaps the
    inner two lines for soundfile/librosa decode, the framing math and
    the fan-out shape stay."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "window_idx": [], "n_samples": [], "rms": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _kind, _w, _h, _nf, body = decode_payload(bytes(p))
                samples = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                for i, off in enumerate(range(0, len(samples), hop)):
                    wnd = samples[off : off + frame]
                    out["media_id"].append(int(mid))
                    out["window_idx"].append(i)
                    out["n_samples"].append(len(wnd))
                    out["rms"].append(float(np.sqrt(np.mean(wnd * wnd))))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "window_idx": pd.array(out["window_idx"], dtype="int32"),
                    "n_samples": pd.array(out["n_samples"], dtype="int32"),
                    "rms": pd.array(out["rms"], dtype="float32"),
                }
            )

    return (
        media.filter(media.kind == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, _AUDIO_WIN_SCHEMA)
    )
