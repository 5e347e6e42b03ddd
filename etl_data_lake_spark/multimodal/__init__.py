"""Multimodal columns: image/audio/video as opaque binary + metadata.

The reference has no multimodal surface (its type surface is
string/long/double/timestamp — SURVEY §1.4); this package is the
training-data-pipeline extension. Design:

* a media row is ``(media_id, kind, payload binary, meta struct)`` —
  the payload is NEVER interpreted by Spark itself, only by
  Arrow-batched ``mapInPandas`` stages;
* decode / feature-extract / frame-sample are per-batch pandas
  transforms (:mod:`decode`); real image/audio codecs are gated
  behind import-try stubs (the libraries are not in this container) —
  the deterministic FAKE1 container format exercises the identical
  plumbing: schema, batch shape, partitioning, UDF signatures;
* scale rules: project payloads away before any shuffle (metadata
  travels, bytes don't), decode AFTER filtering, and size input
  partitions by bytes not rows (``spark.sql.files.maxPartitionBytes``)
  because one row can be megabytes.
"""

from etl_data_lake_spark.multimodal.codec import (  # noqa: F401
    FAKE_MAGIC,
    fake_media_table,
)
from etl_data_lake_spark.multimodal.decode import (  # noqa: F401
    byte_histograms,
    decode_metadata,
    sample_frames,
    select_keyframes,
)
from etl_data_lake_spark.multimodal.phash import (  # noqa: F401
    dhash_images,
    image_near_dup_pairs,
    phash_near_dup_pairs,
)
