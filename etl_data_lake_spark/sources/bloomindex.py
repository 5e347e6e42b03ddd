"""Per-file Bloom-filter sidecars — point-lookup file skipping.

Manifest min/max stats (txn.py) prune RANGE predicates, but they are
useless for point lookups on a high-cardinality column that is not
clustered: every file's [min, max] spans nearly the whole key space,
so ``WHERE user_id = X`` still plans every file. The lakehouse answer
(Delta's bloom-filter index, Iceberg's Puffin blobs) is a per-file
Bloom filter consulted at planning time: a file whose filter says
"definitely not present" is skipped before its footer is ever read.

Design — sized for 100 TB, not for the manifest:

* Filters live in SIDECAR JSON documents under ``table/_bloom/``,
  mirroring the data layout, ONE DOCUMENT PER (file, column) — NOT
  inside the commit manifests, which must stay O(Δfiles)-small, and
  not in shared per-file docs, whose read-modify-write would let
  concurrent per-column builds drop each other's filters. Data files
  are immutable, so a sidecar is write-once-valid-forever; a
  (file, column) without one is conservatively scanned (exactly like
  a file without min/max stats).
* Building is DISTRIBUTED: one Spark job per column hashes every row
  JVM-side (``xxhash64`` inside whole-stage codegen — no Python in
  the per-row path) and ships only the 64-bit hashes into an
  Arrow-batched ``applyInPandas`` that sets bits per file. The driver
  collects just the finished bitmaps — O(#files × filter size), never
  the data.
* Membership uses standard double hashing (Kirsch & Mitzenmacher
  2006): the JVM hash ``h`` splits into ``h1``/``h2`` and probe ``i``
  checks bit ``(h1 + i*h2) mod m`` — so the READER can probe with the
  same engine-computed ``xxhash64`` of the lookup value (one tiny
  driver-side job per lookup batch), and writer/reader can never
  disagree on the hash function.
* Filters are sized from the file's observed distinct count for the
  requested false-positive rate and capped at ``max_bits`` (default
  512 Kbit = 64 KB — a saturated cap degrades the FPR, never
  correctness).

No false negatives by construction; false positives only cost a
redundant file scan. The residual row filter is always applied, so
results are exact either way.
"""

from __future__ import annotations

import base64
import json
import math
import os
import uuid
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from etl_data_lake_spark.sources.txn import (
    TxnTable,
    _stat_key,
    _stats_disjoint,
)

_BLOOM_DIR = "_bloom"


def _sidecar_path(root: Path, rel_file: str, col: str) -> Path:
    # rel_file is "data/<uuid>/part-*.parquet" — mirrored under
    # _bloom/, ONE DOCUMENT PER (file, column): concurrent builds for
    # different columns never read-modify-write a shared doc (a
    # last-writer-wins merge would silently drop the other column's
    # filter), and a (file, col) doc is write-once like its data file.
    parts = rel_file.split("/")
    rel = "/".join(parts[1:]) if parts[0] == "data" else rel_file
    return root / _BLOOM_DIR / f"{rel}.{col}.json"


def _size_filter(n_distinct: int, fpp: float, max_bits: int) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_distinct`` keys at ``fpp`` — the
    textbook formulas, m rounded to whole bytes and capped."""
    n = max(int(n_distinct), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, min(m, max_bits))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _set_bits(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """Bitmap (uint8[m/8]) with k double-hashed bits set per hash."""
    h = hashes.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)) % np.uint64(m)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)) % np.uint64(m)
    bits = np.zeros(m // 8, dtype=np.uint8)
    idx = h1.copy()
    for _ in range(k):
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
        idx = (idx + h2) % np.uint64(m)
    return bits


def _maybe_contains(doc: dict, h: int) -> bool:
    """Probe one column's sidecar entry with a signed-64 JVM hash."""
    m, k = doc["m"], doc["k"]
    bits = np.frombuffer(base64.b64decode(doc["bits"]), dtype=np.uint8)
    h = np.uint64(h & 0xFFFFFFFFFFFFFFFF)
    idx = int(h & np.uint64(0xFFFFFFFF)) % m
    step = int((h >> np.uint64(32)) | np.uint64(1)) % m
    for _ in range(k):
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
        idx = (idx + step) % m
    return True


def build_bloom_index(
    table: TxnTable,
    cols: tuple[str, ...] | list[str],
    fpp: float = 0.01,
    max_bits: int = 1 << 19,
    version: int | None = None,
) -> int:
    """Build missing sidecars for ``cols`` over the files of
    ``version`` (default latest). Incremental and idempotent: files
    whose sidecar already covers a column are skipped, so running this
    after every few commits costs O(new files). Returns the number of
    (file, column) entries built.

    Maintenance-op placement (like OPTIMIZE/Z-order, not the write
    path): building reads the indexed column once, which the hot
    append path shouldn't pay; a file is conservatively scanned until
    its filter exists."""
    meta = table.snapshot_meta(version)
    if meta is None or not meta.files:
        return 0
    schema = meta.schema()
    have = set(schema.fieldNames())
    cols = [c for c in cols if c in have]
    built = 0
    for col in cols:
        # sidecars are keyed by the PHYSICAL column name (stable
        # across renames, like manifest stats)
        phys = meta.phys(col)
        todo = [
            f for f in meta.files
            if not _sidecar_path(table.root, f, phys).is_file()
        ]
        if not todo:
            continue

        # RAW read, deletion vectors NOT applied: a vector can be
        # cleared later (restore), and a sidecar missing those rows'
        # hashes would then give bloom FALSE NEGATIVES — extra hashes
        # for currently-deleted rows are merely conservative
        hashed = (
            table._read_with_positions(
                meta, todo, meta.schema(), apply_dvs=False
            )
            .where(F.col(col).isNotNull())
            .select(
                F.col("__dv_file").alias("__file"),
                F.xxhash64(F.col(col)).alias("__h"),
            )
        )

        dtype_str = meta.schema()[col].dataType.simpleString()

        def make(pdf: pd.DataFrame) -> pd.DataFrame:
            hs = pdf["__h"].to_numpy(dtype=np.int64)
            uniq = np.unique(hs)
            m, k = _size_filter(len(uniq), fpp, max_bits)
            bits = _set_bits(uniq, m, k)
            return pd.DataFrame(
                {
                    "file": [pdf["__file"].iloc[0]],
                    "m": [m],
                    "k": [k],
                    "bits": [base64.b64encode(bits.tobytes()).decode()],
                }
            )

        rows = (
            hashed.groupBy("__file")
            .applyInPandas(make, "file string, m long, k long, bits string")
            .collect()
        )
        by_rel = {r["file"]: r for r in rows}  # keep_file_col: rel paths
        for f in todo:
            hit = by_rel.get(f)
            if hit is None:
                # file had only nulls for col (or no rows): an empty
                # filter is still exact — nothing can match
                m, k = 64, 1
                entry = {
                    "m": m, "k": k,
                    "bits": base64.b64encode(b"\x00" * (m // 8)).decode(),
                    "dtype": dtype_str,
                }
            else:
                entry = {
                    "m": hit["m"], "k": hit["k"], "bits": hit["bits"],
                    "dtype": dtype_str,
                }
            p = _sidecar_path(table.root, f, phys)
            p.parent.mkdir(parents=True, exist_ok=True)
            tmp = p.parent / f".tmp-{uuid.uuid4().hex}"
            tmp.write_text(json.dumps(entry))
            # atomic replace; concurrent builders of the SAME (file,
            # col) write identical content, so last-wins is benign —
            # cross-column races no longer share a document at all
            os.replace(tmp, p)
            built += 1
    return built


def sidecar_exists(table: TxnTable, rel_file: str, col: str, meta=None) -> bool:
    """True when ``rel_file`` has a Bloom sidecar for ``col`` — the
    cheap existence probe callers (e.g. MERGE pass 1) use to decide
    whether a bloom pruning tier can help at all. Pass ``meta`` to
    resolve the physical column name without re-reading the log."""
    if meta is None:
        meta = table.snapshot_meta()
    phys = meta.phys(col) if meta is not None else col
    return _sidecar_path(table.root, rel_file, phys).is_file()


def _probe_hashes(table: TxnTable, col, values, schema) -> list[int]:
    """xxhash64 of each probe value, computed BY SPARK with the
    column's table type — bit-identical to what the builder hashed."""
    from pyspark.sql.types import StructField, StructType

    f = next(fld for fld in schema.fields if fld.name == col)
    df = table.spark.createDataFrame(
        [(v,) for v in values], StructType([StructField("v", f.dataType)])
    )
    return [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]


def files_matching_eq(
    table: TxnTable,
    col: str,
    values,
    version: int | None = None,
    files: list[str] | None = None,
) -> tuple[list[str], int]:
    """Files that can contain a row with ``col`` equal to ANY of
    ``values`` → (kept files, total files). Composes both pruning
    tiers: manifest [min, max] first (free — already in memory), then
    the Bloom sidecar (one small read per surviving file). Files
    missing either tier of metadata are conservatively kept by it.
    ``files`` restricts the probe to a pre-pruned subset of the
    snapshot's files (e.g. MERGE's stats-surviving candidates); the
    returned total still counts the whole snapshot."""
    meta = table.snapshot_meta(version)
    if meta is None:
        raise FileNotFoundError(f"no committed version at {table.root}")
    values = [v for v in values if v is not None]
    if not values:
        return [], len(meta.files)
    hashes = _probe_hashes(table, col, values, meta.schema())
    phys = meta.phys(col)
    keep = []
    for f in meta.files if files is None else files:
        rng = meta.file_stats.get(f, {}).get(phys)
        vs_h = list(zip(values, hashes))
        if rng is not None:
            # _stat_key: time values -> manifest form; _stats_disjoint
            # width-reconciles date-vs-timestamp ISO strings and keeps
            # a value conservatively on incomparable stats types
            vs_h = [
                (v, h)
                for v, h in vs_h
                if not _stats_disjoint(rng, _stat_key(v), _stat_key(v))
            ]
            if not vs_h:
                continue
        p = _sidecar_path(table.root, f, phys)
        if p.is_file():
            try:
                doc = json.loads(p.read_text())
                if not {"m", "k", "bits"} <= set(doc):
                    doc = None
                # a filter built under a DIFFERENT column type hashed
                # different bytes — trusting it would be a false
                # negative; conservative keep (widening also retires
                # these docs commit-side, this guards the race and
                # any doc the retire pass missed)
                elif doc.get("dtype") is not None and doc["dtype"] != (
                    meta.schema()[col].dataType.simpleString()
                ):
                    doc = None
            except (ValueError, OSError):
                doc = None
            if doc is not None and not any(
                _maybe_contains(doc, h) for _, h in vs_h
            ):
                continue
        keep.append(f)
    return keep, len(meta.files)


def snapshot_where_eq(
    table: TxnTable,
    col: str,
    values,
    version: int | None = None,
) -> DataFrame:
    """The table filtered to ``col IN (values)`` with both stats- and
    Bloom-level file skipping; exact via the residual row filter."""
    meta = table.snapshot_meta(version)
    if meta is None:
        raise FileNotFoundError(f"no committed version at {table.root}")
    values = [v for v in values if v is not None]
    keep, _ = files_matching_eq(table, col, values, version)
    pred = F.col(col).isin(values) if values else F.lit(False)
    return table.read_files(meta, keep).where(pred)


def vacuum_bloom(table: TxnTable) -> int:
    """Remove sidecar dirs whose data dir no longer exists (after
    :meth:`TxnTable.vacuum`). Returns dirs removed."""
    import shutil

    bloom = table.root / _BLOOM_DIR
    data = table.root / "data"
    removed = 0
    if bloom.is_dir():
        for d in bloom.iterdir():
            if d.is_dir() and not (data / d.name).is_dir():
                shutil.rmtree(d)
                removed += 1
    return removed
