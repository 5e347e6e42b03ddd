"""Minimal transactional table layer over plain parquet (a la Delta).

The reference writes bare parquet directories (``/root/reference/
etl.py:74-76``): a rerun crashes (quirk Q9), a crash mid-write leaves
torn state, concurrent writers corrupt each other, and readers see
half-written tables. BASELINE.md records the decision to stay on plain
parquet for the *query* tables (the container has no Delta/Iceberg
jars); this module is the in-repo answer for the *pipeline* tables
that actually need ACID: a log-structured commit protocol implementing
the core of the Delta Lake design (Armbrust et al., "Delta Lake:
High-Performance ACID Table Storage over Cloud Object Stores",
VLDB 2020 — see PAPERS.md) with nothing but parquet + JSON manifests.

Layout::

    table/
      _txnlog/v000000000001.json        # INCREMENTAL manifest per commit
      _txnlog/v000000000010.ckpt.json   # full-snapshot checkpoint
      _txnlog/_last_checkpoint          # advisory pointer to newest ckpt
      data/<uuid>/part-*.parquet        # immutable data files, write-once

Each manifest is a DELTA: the files the commit adds and removes, the
(merged) schema, the cumulative per-writer transaction watermarks, and
per-added-file column stats — O(Δfiles) JSON per commit, never
O(#files). Every ``checkpoint_interval`` commits the committer also
publishes a checkpoint carrying the full reconstructed snapshot
(Delta's parquet-checkpoint idea in JSON), so a reader resolves state
from the newest checkpoint ≤ v plus at most ``checkpoint_interval``
incremental manifests — at 100 TB / 10⁶ files the log replay cost is
bounded by the interval, not the table's commit history. Data files
are never mutated and manifests are published atomically, so snapshot
isolation is unchanged; time travel is "reconstruct at an older v".

Commit protocol (optimistic concurrency, object-store friendly):

1. stage data files under ``data/<uuid>/`` (unique dir, write-once;
   a crash here leaves an orphan dir that no manifest references —
   invisible to readers, reclaimed by :meth:`TxnTable.vacuum`);
2. build the next manifest and publish it with an atomic
   create-if-absent (``os.link`` — fails with EEXIST if another
   writer won the version);
3. on losing the race: re-read the new latest snapshot and REBASE —
   appends always rebase (their files conflict with nothing);
   compaction rebases iff every file it rewrote still exists in the
   winner's snapshot (else its input was concurrently replaced —
   abort); overwrite aborts on any concurrent commit. This is the
   Delta conflict matrix restricted to the operations shipped here.

Checkpoints are published with the same create-if-absent primitive
AFTER the commit wins, and are advisory: a crash between manifest and
checkpoint just means readers replay a longer tail until the next
checkpointing commit; a duplicate attempt hits EEXIST and moves on.

Idempotent writes: a commit may carry ``(app_id, txn_seq)``; the
manifest tracks the highest seq applied per app_id, and a commit at or
below the watermark becomes a no-op. `foreachBatch` sinks pass the
Structured Streaming batch id as the seq, turning at-least-once batch
replays into exactly-once table commits (:func:`txn_append_sink`).

Scale notes (100 TB): commits and their manifests are O(Δfiles);
reads are O(checkpoint + interval·Δ). Latest-version resolution is
pointer-based (Delta's ``_last_checkpoint``): an advisory
``_txnlog/_last_checkpoint`` document names the newest checkpoint,
and because versions are dense the reader probes manifests FORWARD
from it by existence — O(interval) point lookups, no directory
listing anywhere on the read path (at 10⁵ commits on an object store
this replaces a paged LIST of the whole log prefix with a few GETs).
Per-writer txn watermarks are O(#writers), not O(#commits).
``os.link`` is the local-FS stand-in for the object store's
put-if-absent (S3 conditional PUT, GCS if-generation-match); the
pointer uses atomic replace (its object-store analog is a plain
overwrite PUT — safe because it is advisory). No data-file renames
happen anywhere, so every code path is object-store safe modulo
those primitives.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

_LOG_DIR = "_txnlog"
_DATA_DIR = "data"
_DV_DIR = "_dv"
_CDC_DIR = "_cdc"
_CDF_PROP = "cdf"  # props key enabling the materialized change feed
_GEN_PREFIX = "generated."  # props key prefix: generated.<col> -> SQL expr
_CHANGE_COL = "_change_type"
_V_WIDTH = 12
_CKPT_SUFFIX = ".ckpt.json"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a conflicting change; caller retries
    the whole logical operation (re-read, re-compute, re-commit)."""


class SchemaEvolutionError(ValueError):
    """An append's schema conflicts with the table's (same column
    name, different type). New columns are allowed — old files read
    them as null; type changes are not."""


class ConstraintViolationError(ValueError):
    """Staged rows violate a table CHECK constraint; nothing was
    committed (the orphan stage dir is invisible and vacuumed)."""


def largest_gap_ranges(values, max_ranges: int) -> list[tuple]:
    """Gap-split distinct numeric ``values`` into <= ``max_ranges``
    tight [lo, hi] ranges by cutting at the largest gaps — the shared
    policy behind matview range refreshes and merge concurrency
    guards (one implementation, so the two can't drift): scattered
    keys produce scattered tight ranges, not the hull between them."""
    ks = sorted(values)
    if not ks:
        return []
    gaps = sorted(
        ((b - a, i) for i, (a, b) in enumerate(zip(ks, ks[1:]))),
        key=lambda g: -g[0],
    )
    cuts = sorted(
        i for _, i in gaps[: max(0, min(max_ranges - 1, len(gaps)))]
    )
    out, start = [], 0
    for c in cuts:
        out.append((ks[start], ks[c]))
        start = c + 1
    out.append((ks[start], ks[-1]))
    return out


# LOSSLESS type-widening lattice (Delta's type-widening feature set,
# integral/float subset): (narrow, wide) pairs where every narrow
# value is exactly representable as the wide type AND the parquet
# reader upcasts narrow files under the wide read schema (verified on
# this engine for all pairs below; the datasource's pyarrow path casts
# explicitly). long->double and int->float are DELIBERATELY absent —
# both lose precision.
_WIDENS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
}


def _wider(a, b):
    """The wider of two types when one losslessly widens to the other
    (or they are equal); None when neither direction is lossless."""
    if a == b:
        return a
    an, bn = a.simpleString(), b.simpleString()
    if (an, bn) in _WIDENS:
        return b
    if (bn, an) in _WIDENS:
        return a
    return None


def merge_schemas(base: StructType, incoming: StructType) -> StructType:
    """Additive schema evolution: the union of both field lists, base
    order first. Shared names must agree on type exactly OR widen
    LOSSLESSLY along the ``_WIDENS`` lattice (int->bigint,
    float->double, ...): a wider incoming column widens the published
    schema (old narrow files read correctly under it — the engine
    upcasts at scan time), a narrower incoming one is simply read
    under the table's wider type. Anything lossy or incomparable
    still raises — silent narrowing is how lakes corrupt
    themselves. NOTE: widening a column invalidates its bloom
    sidecars (the engine hash is type-dependent); the commit path
    retires them, and probes also ignore sidecars stamped with a
    different dtype."""
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f in incoming.fields:
        have = by_name.get(f.name)
        if have is None:
            out.append(f)
        elif have.dataType != f.dataType:
            w = _wider(have.dataType, f.dataType)
            if w is None:
                raise SchemaEvolutionError(
                    f"column {f.name!r}: table has "
                    f"{have.dataType.simpleString()}, append has "
                    f"{f.dataType.simpleString()} (not losslessly "
                    f"widenable)"
                )
            if w != have.dataType:
                out[out.index(have)] = StructField(
                    f.name, w, have.nullable or f.nullable
                )
    return StructType(out)


@dataclass(frozen=True)
class Snapshot:
    version: int
    operation: str
    files: tuple[str, ...]  # relative to the table root
    schema_json: str
    writer_txns: dict[str, int]  # app_id -> highest applied txn_seq
    # relpath -> {col -> entry} for stats-tracked columns, where entry
    # is [min, max] (ranges only), [min, max, null_count, num_rows]
    # (both), or [None, None, null_count, num_rows] (all-null column —
    # nulls known, no range). Readers index [0]/[1] for range proofs
    # (treating a None min as unknown) and [2]/[3] for null skipping;
    # files without an entry are never skipped
    file_stats: dict[str, dict[str, list]]
    # name -> SQL CHECK expression every committed row must satisfy
    # (SQL semantics: TRUE or UNKNOWN passes, FALSE violates)
    constraints: dict[str, str] = field(default_factory=dict)
    # data file -> deletion-vector sidecar (relative, under _dv/):
    # positions listed there are DELETED rows readers must drop
    # (merge-on-read). Entries vanish with their data file; a file
    # without one has no deleted rows.
    file_dvs: dict[str, str] = field(default_factory=dict)
    # COLUMN MAPPING (rename/drop without data rewrites): logical
    # column name -> PHYSICAL name as written in parquet. Physical
    # names are immutable for a column's lifetime; a column absent
    # from the map is physical==logical (every pre-mapping table).
    # Manifest stats and bloom sidecars are keyed by PHYSICAL names.
    column_map: dict[str, str] = field(default_factory=dict)
    # physical names of DROPPED columns: their data still sits in old
    # files, so no new column may claim the name (resurrection guard)
    retired_cols: tuple[str, ...] = ()
    # IDENTITY columns (GENERATED ALWAYS AS IDENTITY): col ->
    # {"start": int, "step": int, "high": int | None} where "high" is
    # the furthest value ever allocated in step direction (None until
    # the first assignment). Appends allocate past it and CAS it
    # forward; values are unique but NOT dense (failed attempts and
    # partition-sparse allocation burn ranges, like Delta's identity)
    identity: dict = field(default_factory=dict)
    # frozen Z-order spec (sinks.compute_zorder_spec): bucket bounds
    # and cut points under which every clustered file's _z footer
    # stats were computed — frozen so z-ranges from different commits
    # are interval-comparable (incremental OPTIMIZE ZORDER's
    # soundness condition). Empty until the first optimize_zorder.
    zorder_spec: dict = field(default_factory=dict)
    # TABLE PROPERTIES (Delta's TBLPROPERTIES): free-form str -> str
    # metadata riding manifests and checkpoints. Feature flags live
    # here — props["cdf"] == "true" enables materialized change-data
    # files for DML commits. Properties survive RESTORE (like writer
    # watermarks: they describe the TABLE, not a snapshot's data).
    props: dict = field(default_factory=dict)

    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))

    def phys(self, col: str) -> str:
        """Physical parquet name of logical column ``col``."""
        return self.column_map.get(col, col)

    def phys_schema(self, schema: StructType | None = None) -> StructType:
        """``schema`` (default: the snapshot's) with every field under
        its physical name — what the parquet reader must be given."""
        if schema is None:
            schema = self.schema()
        if not self.column_map:
            return schema
        return StructType(
            [
                StructField(
                    self.column_map.get(f.name, f.name),
                    f.dataType,
                    f.nullable,
                )
                for f in schema.fields
            ]
        )


@dataclass(frozen=True)
class ReadPlan:
    """How a snapshot was reconstructed — checkpoint used (0 = none)
    and how many incremental manifests were replayed on top. Exposed
    for tests and observability; bounded by ``checkpoint_interval``."""

    version: int
    checkpoint: int
    n_manifests: int


def _manifest_path(root: Path, version: int) -> Path:
    return root / _LOG_DIR / f"v{version:0{_V_WIDTH}d}.json"


def _ckpt_path(root: Path, version: int) -> Path:
    return root / _LOG_DIR / f"v{version:0{_V_WIDTH}d}{_CKPT_SUFFIX}"


def _pointer_path(root: Path) -> Path:
    return root / _LOG_DIR / "_last_checkpoint"


def _stat_key(v):
    """Normalize a stats or query-bound value to its MANIFEST form.
    Date and timestamp values become fixed-width ISO strings
    ("YYYY-MM-DD" / "YYYY-MM-DD HH:MM:SS.ffffff"), whose lexicographic
    order IS chronological order — so they survive JSON manifests and
    compare correctly against each other; every range comparator
    (files_matching*, the _commit guard, the bloom min/max tier)
    passes caller bounds through this, so callers hand in plain
    date/datetime objects and prune time columns like any other.
    Aware datetimes normalize to UTC (the engine's session timezone)
    first. Everything else passes through unchanged."""
    import datetime

    if isinstance(v, datetime.datetime):  # before date: datetime IS a date
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        # isoformat zero-pads the year (strftime %Y does not on glibc
        # for years < 1000, which would break lexicographic order)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


_DATE_ISO = re.compile(r"\d{4}-\d{2}-\d{2}")
_TS_ISO = re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}")


def _widen_iso(a, b):
    """Width-reconcile a mixed date-ISO / timestamp-ISO pair: the
    10-char date side pads to midnight ('YYYY-MM-DD 00:00:00.000000')
    so the lexicographic compare matches Spark's DATE→TIMESTAMP cast
    semantics. Without this, a date bound against timestamp stats (or
    vice versa) compares 10-char vs 26-char strings and can PRUNE a
    file whose rows the residual row filter would match — silent row
    loss. For genuine string columns that merely look date-shaped the
    padding can only keep a file conservatively, never skip one."""
    if isinstance(a, str) and isinstance(b, str) and len(a) != len(b):
        if _DATE_ISO.fullmatch(a) and _TS_ISO.fullmatch(b):
            return a + " 00:00:00.000000", b
        if _TS_ISO.fullmatch(a) and _DATE_ISO.fullmatch(b):
            return a, b + " 00:00:00.000000"
    return a, b


def _stats_disjoint(rng, lo, hi) -> bool:
    """True only if a file's recorded [rng[0], rng[1]] PROVABLY misses
    [lo, hi]. Mixed date/timestamp ISO widths reconcile first; an
    incomparable pair (e.g. an epoch-int bound against ISO-string time
    stats, or any type-mismatched bound) is never proof — the file is
    conservatively kept (matching _overlaps and the bloom tier, which
    already degrade instead of raising)."""
    r0, hi2 = _widen_iso(rng[0], hi)
    r1, lo2 = _widen_iso(rng[1], lo)
    try:
        return r0 > hi2 or r1 < lo2
    except TypeError:
        return False


def footer_stats(
    root: Path, files: list[str], stats_cols: tuple[str, ...]
) -> dict[str, dict[str, list]]:
    """Per-file column stats from the just-written parquet FOOTERS
    (one metadata read per file, local to the committer) — shared by
    ``_stage`` and the ``txnlake`` DataSource writer. ``stats_cols``
    are PHYSICAL column names. int/float/str mins and maxes are
    recorded directly; date and timestamp stats are normalized to ISO
    strings via :func:`_stat_key` (nanosecond-unit timestamp maxima
    are ceiled one microsecond — the footer value is floored to µs,
    and a max below the true max would skip wrongly); a file with no
    usable stats simply never skips."""
    import datetime

    import pyarrow.parquet as pq

    stats: dict[str, dict[str, list]] = {}
    if not stats_cols:
        return stats
    for rel in files:
        md = pq.read_metadata(root / rel)
        per_col: dict[str, list] = {}
        for col in stats_cols:
            if col not in md.schema.names:
                continue
            idx = md.schema.names.index(col)
            # min/max and null counts tracked INDEPENDENTLY: a footer
            # can know one without the other (an all-null column has
            # null counts but no min/max)
            mins, maxs, nulls = [], [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
                if st is not None and st.null_count is not None:
                    nulls.append(st.null_count)
            have_mm = (
                len(mins) == md.num_row_groups
                and all(
                    isinstance(
                        v, (int, float, str, datetime.date)
                    )  # datetime.datetime IS a datetime.date
                    for v in (min(mins), max(maxs))
                )
                if mins
                else False
            )
            if have_mm and isinstance(max(maxs), datetime.datetime):
                # parquet footer timestamps surface floored to µs; for
                # nanos-unit columns the true max may sit inside the
                # truncated microsecond — ceil it so the recorded max
                # is never below a real value (a floored MIN is already
                # conservative). Unknown units ceil too, same reason.
                # pyarrow's ParquetLogicalType exposes the unit only in
                # its repr (no time_unit/unit attribute — measured on
                # pyarrow 16-21), so sniff the repr's `timeUnit=...`.
                m = re.search(
                    r"timeUnit=(\w+)",
                    str(md.schema.column(idx).logical_type),
                )
                unit = m.group(1).lower() if m else ""
                if unit not in ("microseconds", "milliseconds"):
                    try:
                        maxs = [
                            max(maxs) + datetime.timedelta(microseconds=1)
                        ]
                    except OverflowError:
                        # datetime.max: nothing representable sits
                        # above it in µs space — the floored value is
                        # already an upper bound
                        maxs = [max(maxs)]
            have_nc = len(nulls) == md.num_row_groups
            # entry shapes (readers index [0]/[1] for ranges and,
            # when len >= 4, [2]/[3] for null skipping):
            #   [min, max]                   ranges only
            #   [min, max, nulls, rows]      both
            #   [None, None, nulls, rows]    nulls only
            if have_mm and have_nc:
                per_col[col] = [
                    _stat_key(min(mins)), _stat_key(max(maxs)),
                    sum(nulls), md.num_rows,
                ]
            elif have_mm:
                per_col[col] = [_stat_key(min(mins)), _stat_key(max(maxs))]
            elif have_nc:
                per_col[col] = [None, None, sum(nulls), md.num_rows]
        if per_col:
            stats[rel] = per_col
    return stats


def _manifest_key_expr(root: Path):
    """The MANIFEST KEY of each row's source file, derived from
    ``_metadata.file_path``: in-root files reduce to their
    root-relative path (``data/<uuid>/<part>.parquet`` for staged
    files, bare names for converted-in-place tables), out-of-root
    files (SHALLOW CLONE references) keep their absolute path — in
    both cases exactly the string the manifest lists, so deletion
    vectors, merge probes and touched-file attribution key
    consistently whatever the entry's shape. The ONE place path
    resolution is encoded for readers.

    ``_metadata.file_path`` is always ABSOLUTE (the engine qualifies
    the read path), while ``root`` may be relative or reach the same
    directory through a symlink — a prefix built from ``str(root)``
    alone would silently match nothing and deletion vectors would
    stop applying. Both the absolutized spelling (the engine's
    qualification, symlinks intact) and the fully-resolved one are
    accepted."""
    from pyspark.sql import functions as F

    stripped = F.regexp_replace(
        F.col("_metadata.file_path"), "^file:(//)?", ""
    )
    prefixes = sorted({os.path.abspath(root), str(Path(root).resolve())})
    out = None
    for p in prefixes:
        pref = p.rstrip("/") + "/"
        cond = stripped.startswith(pref)
        val = F.substring(stripped, len(pref) + 1, 2_000_000)
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(stripped)


# refcounted save/restore state for _micros_ts_writes: without it, the
# FIRST finishing writer's restore would flip the session conf back to
# INT96 while a concurrent stager's write job is still running — whose
# files would then land with NO footer min/max, silently killing their
# timestamp stats (the exact failure the context manager prevents).
# Keyed PER SESSION (SQLConf is per-SparkSession — spark.newSession()
# has its own): id(session) -> [depth, saved]; entries delete at depth
# 0, so no leak and no weakref requirement.
_MICROS_TS_LOCK = threading.RLock()
_MICROS_TS_STATE: dict[int, list] = {}


def _micros_ts_writes(spark):
    """Context manager: the staged write lands timestamps as annotated
    TIMESTAMP_MICROS whatever the caller's session default — Spark's
    INT96 default writes NO footer min/max statistics (measured), which
    would silently kill every manifest stat and file skip on a
    timestamp column. The conf is shared by every stager ON THE SAME
    SESSION, so the save/restore is REFCOUNTED per session: the first
    enterer saves and sets, the last exiter restores — overlapping
    stagers never see an early restore mid-write, and stagers on a
    DIFFERENT session (own SQLConf) get their own set/restore instead
    of silently skipping the set."""
    from contextlib import contextmanager

    @contextmanager
    def cm():
        key = "spark.sql.parquet.outputTimestampType"
        sid = id(spark)
        with _MICROS_TS_LOCK:
            st = _MICROS_TS_STATE.get(sid)
            if st is None:
                try:
                    saved = spark.conf.get(key)
                except Exception:
                    saved = None
                try:
                    spark.conf.set(key, "TIMESTAMP_MICROS")
                except Exception:
                    pass  # static in exotic deployments: stage works
                st = _MICROS_TS_STATE[sid] = [0, saved]
            st[0] += 1
        try:
            yield
        finally:
            with _MICROS_TS_LOCK:
                st = _MICROS_TS_STATE[sid]
                st[0] -= 1
                if st[0] == 0:
                    del _MICROS_TS_STATE[sid]
                    old = st[1]
                    if old is not None and old != "TIMESTAMP_MICROS":
                        try:
                            spark.conf.set(key, old)
                        except Exception:
                            pass

    return cm()


def _generated_defs(props: dict) -> dict[str, str]:
    """{logical column -> generation SQL expr} from the table-property
    namespace ``generated.<col>`` (managed exclusively by
    :meth:`TxnTable.add_generated_column` — set/unset_properties
    reject the prefix). Riding on properties means the definitions
    flow through manifests, checkpoints, RESTORE and CLONE with zero
    extra plumbing."""
    return {
        k[len(_GEN_PREFIX):]: v
        for k, v in props.items()
        if k.startswith(_GEN_PREFIX)
    }


def _expr_refs(expr: str, col: str) -> bool:
    """Conservative textual test: does SQL ``expr`` reference ``col``?
    Same word-boundary rule the CHECK-constraint rename/drop guards
    use — false positives (the name inside a string literal) err
    toward safety."""
    import re

    return re.search(rf"\b{re.escape(col)}\b", expr) is not None


def _generated_invariant_sql(col: str, expr: str) -> str:
    """The CHECK-shaped invariant every staged data file must satisfy
    for a generated column: NULL (legacy rows written before the
    column was registered, carried verbatim by rewrites) or exactly
    the generation expression's value. Strict about one-sided nulls:
    ``coalesce(.., FALSE)`` keeps a non-null stored value with a null
    expression result from sneaking through as UNKNOWN. Portable SQL
    (Spark and DuckDB) because the txnlake writer validates commits in
    a session-less worker via the DuckDB fallback."""
    return f"({col} IS NULL) OR coalesce(({col}) = ({expr}), FALSE)"


class TxnTable:
    """Handle to a transactional parquet table rooted at ``path``.

    Handles are stateless: every operation resolves the latest
    committed version at commit time, so any number of handles (in any
    number of processes) can target the same table.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        checkpoint_interval: int = 10,
    ):
        self.spark = spark
        self.root = Path(path)
        self.checkpoint_interval = max(int(checkpoint_interval), 1)

    # ---------------------------------------------------------- log --
    #
    # No directory listings anywhere on the read path: versions are
    # DENSE integers (every commit is base+1), so the latest version is
    # found by reading the advisory ``_last_checkpoint`` pointer and
    # probing manifests FORWARD from it by existence — O(commits since
    # the pointed checkpoint) point lookups, which the pointer keeps at
    # ~checkpoint_interval. On an object store at 10⁵ commits this is
    # the difference between a paged LIST over the whole log prefix and
    # a handful of GETs (Delta's ``_last_checkpoint`` design). The
    # pointer is ADVISORY: last-writer-wins, monotonically advanced
    # after a checkpoint publishes, and a stale/missing pointer (crash
    # between checkpoint and pointer update, a table that has never
    # checkpointed) only lengthens the probe walk — never changes the
    # resolved state.

    def _read_pointer(self) -> tuple[int, int] | None:
        """→ (pointed checkpoint version, writer's checkpoint
        interval), or None when absent/stale. ANY malformed document
        (torn write, wrong types, wrong shape) degrades to the
        no-pointer walk rather than erroring — the pointer is
        advisory; the checkpoint's existence is verified with one
        stat. The recorded interval lets a reader opened with a
        DIFFERENT checkpoint_interval still find the writer's
        checkpoints during backward probing."""
        try:
            doc = json.loads(_pointer_path(self.root).read_text())
            v = int(doc["version"])
            interval = int(doc.get("interval", self.checkpoint_interval))
        except (OSError, ValueError, KeyError, TypeError):
            return None
        if v > 0 and interval > 0 and _ckpt_path(self.root, v).is_file():
            return v, interval
        return None

    def _advance_pointer(self, version: int) -> None:
        """Monotonic last-writer-wins pointer update (atomic replace —
        readers see the old or the new document, never a partial one).
        The read-check keeps a slow old checkpointer from moving the
        pointer backwards; the residual race is harmless because the
        pointer is advisory."""
        cur = self._read_pointer()
        if cur is not None and cur[0] >= version:
            return
        log = self.root / _LOG_DIR
        tmp = log / f".ptr-{uuid.uuid4().hex}"
        tmp.write_text(
            json.dumps(
                {"version": version, "interval": self.checkpoint_interval}
            )
        )
        os.replace(tmp, _pointer_path(self.root))

    def _resolve(self, version: int | None) -> tuple[int, int]:
        """→ (target version, newest known checkpoint ≤ target; 0 =
        none). Latest-version resolution probes manifests forward from
        the pointer; the checkpoint for TIME TRAVEL is found by
        probing interval multiples backward from the target (bounded
        below by the pointer when it applies, so a fresh pointer makes
        both directions O(interval))."""
        ptr = self._read_pointer()
        ptr_v = ptr[0] if ptr else 0
        if version is None:
            target = ptr_v
            while _manifest_path(self.root, target + 1).is_file():
                target += 1
        else:
            target = version
        ck = ptr_v if ptr_v and ptr_v <= target else 0
        # probe with the WRITER's interval (recorded in the pointer)
        # so a handle opened with a different checkpoint_interval
        # still finds the checkpoints that actually exist
        step = ptr[1] if ptr else self.checkpoint_interval
        c = (target // step) * step
        while c > ck:
            if _ckpt_path(self.root, c).is_file():
                ck = c
                break
            c -= step
        return target, ck

    def latest_version(self) -> int:
        """Highest committed version, 0 if the table doesn't exist."""
        return self._resolve(None)[0]

    def _read_manifest(self, version: int) -> dict:
        return json.loads(_manifest_path(self.root, version).read_text())

    def _reconstruct(
        self, version: int, start: int
    ) -> tuple[Snapshot, ReadPlan]:
        """State at ``version`` = the checkpoint at ``start`` (0 =
        none) + replay of the incremental manifests after it."""
        files: list[str] = []
        stats: dict[str, dict[str, list]] = {}
        txns: dict[str, int] = {}
        cons: dict[str, str] = {}
        dvs: dict[str, str] = {}
        cmap: dict[str, str] = {}
        retired: tuple[str, ...] = ()
        ident: dict = {}
        zspec: dict = {}
        props: dict = {}
        schema_json = ""
        operation = ""
        if start:
            ck = json.loads(_ckpt_path(self.root, start).read_text())
            files = list(ck["files"])
            stats = dict(ck.get("file_stats", {}))
            txns = dict(ck.get("writer_txns", {}))
            cons = dict(ck.get("constraints", {}))
            dvs = dict(ck.get("file_dvs", {}))
            cmap = dict(ck.get("column_map", {}))
            retired = tuple(ck.get("retired_cols", ()))
            ident = dict(ck.get("identity", {}))
            zspec = dict(ck.get("zorder_spec", {}))
            props = dict(ck.get("props", {}))
            schema_json = ck["schema"]
            operation = ck["operation"]
        n_replayed = 0
        for v in range(start + 1, version + 1):
            m = self._read_manifest(v)
            n_replayed += 1
            op = m["operation"]
            add = list(m.get("add", ()))
            if op == "append":
                files = files + add
            elif op == "overwrite":
                files = add
                stats = {}
            elif op in ("compact", "merge", "delete", "update", "restore"):
                # one replay rule for every rewrite-shaped commit:
                # drop `remove`, append `add` (merge/delete are
                # compacts with different conflict rules at WRITE time;
                # by replay time only the file diff matters)
                removed = set(m.get("remove", ()))
                # same sorted(remaining)+add order the committer used
                # when it built the post-commit checkpoint state
                files = sorted(f for f in files if f not in removed) + add
            elif op in ("constraint", "schema", "stats", "props"):
                pass  # metadata-only: file set unchanged
                # ("stats" backfills add_stats for existing files via
                # the generic stats.update below)
            else:  # pragma: no cover
                raise ValueError(f"unknown operation {op!r} at v{v}")
            live = set(files)
            stats = {f: s for f, s in stats.items() if f in live}
            stats.update(m.get("add_stats", {}))
            txns = dict(m.get("writer_txns", txns))
            # pre-feature manifests lack the key: carry forward
            cons = dict(m.get("constraints", cons))
            cmap = dict(m.get("column_map", cmap))
            retired = tuple(m.get("retired_cols", retired))
            ident = dict(m.get("identity", ident))
            zspec = dict(m.get("zorder_spec", zspec))
            props = dict(m.get("props", props))
            # deletion vectors: a dropped data file takes its DV with
            # it (live filter); an overwrite reset files -> same rule.
            # A null value is an explicit CLEAR (restore rolling back
            # to a pre-delete vector state for a still-live file)
            dvs = {f: p for f, p in dvs.items() if f in live}
            for f, p in m.get("dv", {}).items():
                if p is None:
                    dvs.pop(f, None)
                else:
                    dvs[f] = p
            schema_json = m["schema"]
            operation = op
        snap = Snapshot(
            version=version,
            operation=operation,
            files=tuple(files),
            schema_json=schema_json,
            writer_txns=txns,
            file_stats=stats,
            constraints=cons,
            file_dvs=dvs,
            column_map=cmap,
            retired_cols=retired,
            identity=ident,
            zorder_spec=zspec,
            props=props,
        )
        return snap, ReadPlan(version, start, n_replayed)

    def snapshot_meta(self, version: int | None = None) -> Snapshot | None:
        v, ck = self._resolve(version)
        if v <= 0:
            return None
        return self._reconstruct(v, ck)[0]

    def read_plan(self, version: int | None = None) -> ReadPlan | None:
        """The reconstruction plan a read of ``version`` uses — lets
        tests assert the checkpoint actually bounds log replay."""
        v, ck = self._resolve(version)
        if v <= 0:
            return None
        return self._reconstruct(v, ck)[1]

    def history(
        self, limit: int | None = None, before: int | None = None
    ) -> list[dict]:
        """Commit log, oldest first. ``limit``/``before`` page it from
        the newest end (``before`` exclusive): at 10⁵ commits
        ``history(limit=20)`` reads 20 manifests, not the whole log —
        the full walk is only the cost of actually asking for
        everything."""
        hi = self.latest_version() if before is None else before - 1
        lo = 1 if limit is None else max(1, hi - limit + 1)
        out = []
        for v in range(lo, hi + 1):
            m = self._read_manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "ts_ms": m.get("ts_ms"),  # None on pre-round-4 logs
                    "params": m.get("params", {}),
                    "n_add": len(m.get("add", ())),
                    "n_remove": len(m.get("remove", ())),
                    "writer_txns": m.get("writer_txns", {}),
                }
            )
        return out

    def version_as_of(self, ts_ms: int) -> int:
        """Newest version committed at or before wall-clock ``ts_ms``
        (TIMESTAMP AS OF). Walks manifests BACKWARD from latest until
        the first stamp <= ts_ms — O(commits after the target), the
        cheap direction for the common "recent point in time" query;
        no directory listing. Commit stamps are advisory (writer
        clocks can disagree), so like Delta the walk takes the first
        qualifying stamp rather than assuming global monotonicity;
        unstamped manifests (pre-feature logs) qualify conservatively.
        Raises FileNotFoundError when the table is empty or every
        commit is newer than ``ts_ms``."""
        v = self.latest_version()
        while v >= 1:
            ts = self._read_manifest(v).get("ts_ms")
            if ts is None or ts <= ts_ms:
                return v
            v -= 1
        raise FileNotFoundError(
            f"no version committed at or before ts_ms={ts_ms}"
        )

    def snapshot_as_of(self, ts_ms: int) -> DataFrame:
        """The table as of wall-clock ``ts_ms`` — time travel without
        knowing version numbers."""
        return self.snapshot(self.version_as_of(ts_ms))

    # -------------------------------------------------------- reads --

    def snapshot(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest). Consistent
        even while concurrent commits land: the file list was fixed at
        publish time and data files are immutable (merge-on-read
        deletes only ever ADD deletion-vector sidecars, which this
        read applies)."""
        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        return self.read_files(meta, list(meta.files))

    def read_files(
        self,
        meta: Snapshot,
        files: list[str],
        keep_file_col: str | None = None,
        schema: StructType | None = None,
    ) -> DataFrame:
        """THE read path: a subset of ``meta``'s files with that
        snapshot's deletion vectors applied. Files without a DV (the
        overwhelmingly common case) take the plain scan with zero
        overhead; when any requested file has one, rows are read with
        their file/position metadata and the deleted positions are
        dropped via a broadcast anti join against the DV sidecars
        (read BY SPARK as JSON — the driver never loads a vector).
        ``keep_file_col`` optionally retains each row's
        manifest-relative file path under that name (pass 1 of MERGE
        uses it for touched-file attribution). ``schema`` overrides
        the read schema (CDF reads an old snapshot's files with the
        newest, widest schema so spans union cleanly)."""
        from pyspark.sql import functions as F

        if schema is None:
            schema = meta.schema()
        cols = schema.fieldNames()
        rel_expr = _manifest_key_expr(self.root)
        if not files:
            out = self.spark.createDataFrame([], schema)
            if keep_file_col is not None:
                out = out.withColumn(keep_file_col, F.lit(None).cast("string"))
            return out
        paths = [str(self.root / f) for f in files]
        dv_files = [f for f in files if f in meta.file_dvs]
        if not dv_files:
            plain = self.spark.read.schema(
                meta.phys_schema(schema)
            ).parquet(*paths)
            if meta.column_map:
                # logical view: physical parquet names aliased back
                plain = plain.select(
                    *[
                        F.col(meta.phys(c)).alias(c) for c in cols
                    ],
                    *(
                        [rel_expr.alias(keep_file_col)]
                        if keep_file_col is not None
                        else []
                    ),
                )
                return plain
            if keep_file_col is not None:
                plain = plain.select(*cols, rel_expr.alias(keep_file_col))
            return plain
        out = self._read_with_positions(meta, files, schema)
        if keep_file_col is not None:
            return out.select(
                *cols, F.col("__dv_file").alias(keep_file_col)
            )
        return out.select(*cols)

    def _read_with_positions(
        self,
        meta: Snapshot,
        files: list[str],
        schema: StructType,
        apply_dvs: bool = True,
    ):
        """Rows of ``files`` with ``__dv_file`` (manifest-relative
        path, :func:`_manifest_key_expr`) and ``__dv_pos`` (row position
        in file) attached, and — unless ``apply_dvs=False`` (the RAW
        view MOR delete unions from and bloom building hashes) —
        ``meta``'s deletion vectors applied via a broadcast anti join
        against the sidecars (read by Spark as JSON — the driver
        never loads a vector)."""
        from pyspark.sql import functions as F

        cols = schema.fieldNames()
        with_pos = self.spark.read.schema(
            meta.phys_schema(schema)
        ).parquet(
            *[str(self.root / f) for f in files]
        ).select(
            *[F.col(meta.phys(c)).alias(c) for c in cols],
            _manifest_key_expr(self.root).alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        dv_files = [f for f in files if f in meta.file_dvs]
        if not dv_files or not apply_dvs:
            return with_pos
        dv = (
            self.spark.read.schema("file string, indices array<long>")
            .json([str(self.root / meta.file_dvs[f]) for f in dv_files])
            .select(
                F.col("file").alias("__dv_file"),
                F.explode("indices").alias("__dv_pos"),
            )
        )
        return with_pos.join(
            F.broadcast(dv), on=["__dv_file", "__dv_pos"], how="left_anti"
        )

    def files_matching(
        self,
        ranges: dict[str, tuple],
        version: int | None = None,
        null_cols: dict[str, bool] | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-stats pruning for a conjunction of between-
        predicates: → (files that can match, total files in snapshot).
        A file is kept unless SOME column's recorded [min, max] proves
        it disjoint from that column's range; files without stats for
        a column are conservatively kept on that column.

        ``null_cols`` adds ``col IS NULL`` (True) / ``col IS NOT
        NULL`` (False) conjuncts pruned via the per-file null counts
        (the two predicate shapes min/max ranges cannot see), so one
        call plans a mixed predicate like ``ts BETWEEN ... AND ref IS
        NULL`` with every skipping tier the manifest has."""
        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        # date/datetime bounds normalize to the manifest's ISO-string
        # stat form (_stat_key); other types pass through
        norm = {
            c: (_stat_key(lo), _stat_key(hi))
            for c, (lo, hi) in ranges.items()
        }
        keep = []
        for f in meta.files:
            ok = True
            for col, (lo, hi) in norm.items():
                rng = meta.file_stats.get(f, {}).get(meta.phys(col))
                # rng[0] is None for a nulls-only entry (all-null
                # column): no range knowledge -> conservatively kept
                if (
                    rng is not None
                    and rng[0] is not None
                    and _stats_disjoint(rng, lo, hi)
                ):
                    ok = False
                    break
            for col, is_null in (null_cols or {}).items() if ok else ():
                rng = meta.file_stats.get(f, {}).get(meta.phys(col))
                nc = rng[2] if rng is not None and len(rng) >= 4 else None
                rows = rng[3] if rng is not None and len(rng) >= 4 else None
                if nc is None:
                    continue  # unknown -> conservatively kept
                if (is_null and nc == 0) or (not is_null and nc >= rows):
                    ok = False
                    break
            if ok:
                keep.append(f)
        return keep, len(meta.files)

    def files_matching_any(
        self,
        col: str,
        ranges,
        version: int | None = None,
    ) -> list[str]:
        """Disjunctive stats pruning on ONE column: files that can
        contain a row with ``col`` in ANY of the [lo, hi] ranges
        (files without stats conservatively kept). The multi-range
        companion of :meth:`files_matching`'s conjunction."""
        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        if not ranges:
            return []  # "in ANY of no ranges" is vacuously false
        norm = [(_stat_key(lo), _stat_key(hi)) for lo, hi in ranges]
        keep = []
        for f in meta.files:
            rng = meta.file_stats.get(f, {}).get(meta.phys(col))
            if rng is None or rng[0] is None or any(
                not _stats_disjoint(rng, lo, hi) for lo, hi in norm
            ):
                keep.append(f)
        return keep

    def snapshot_where_any(
        self, col: str, ranges, version: int | None = None
    ) -> DataFrame:
        """The table filtered to ``col`` in ANY of the ranges, with
        manifest-level file skipping (disjunctive form of
        :meth:`snapshot_where`); exact via the residual row filter."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        keep = self.files_matching_any(col, ranges, version)
        pred = (
            reduce(or_, [F.col(col).between(lo, hi) for lo, hi in ranges])
            if ranges
            else F.lit(False)  # empty disjunction: no row matches
        )
        return self.read_files(meta, keep).where(pred)

    def snapshot_where_ranges(
        self,
        ranges: dict[str, tuple],
        version: int | None = None,
        null_cols: dict[str, bool] | None = None,
    ) -> DataFrame:
        """The table filtered to the conjunction of ``lo <= col <= hi``
        predicates, with MANIFEST-level file skipping on every range:
        files whose recorded [min, max] (see ``stats_cols`` on the
        write path) are disjoint from any predicate never reach the
        Spark scan at all — pruning happens before the reader lists a
        single footer, which at 100 TB is the difference between
        planning over 10⁶ files and over the handful that can match.
        Multi-column predicates are the Z-ORDER case: data clustered
        with sinks.write_zorder_txn keeps every cluster column's
        per-file span tight, so a 2-D box prunes on both dimensions.
        Files without stats are conservatively kept; the residual
        row-level filter is applied either way, so the result is
        exact. ``null_cols`` adds IS [NOT] NULL conjuncts with
        null-count file skipping (see :meth:`files_matching`)."""
        from pyspark.sql import functions as F

        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        keep, _ = self.files_matching(ranges, version, null_cols)
        pred = None
        for col, (lo, hi) in ranges.items():
            p = F.col(col).between(lo, hi)
            pred = p if pred is None else (pred & p)
        for col, is_null in (null_cols or {}).items():
            p = F.col(col).isNull() if is_null else F.col(col).isNotNull()
            pred = p if pred is None else (pred & p)
        if pred is None:
            pred = F.lit(True)
        return self.read_files(meta, keep).where(pred)

    def snapshot_where(
        self, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Single-column form of :meth:`snapshot_where_ranges`."""
        return self.snapshot_where_ranges({col: (lo, hi)}, version)

    def snapshot_where_expr(
        self,
        predicate: str,
        prune_hints: dict | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """The table filtered by an ARBITRARY SQL predicate — the
        read-side companion of :meth:`delete_where_expr`, same
        planning: the predicate validates against the snapshot schema
        before any job, optional ``prune_hints`` ranges skip files
        through manifest stats (the caller's promise that the
        predicate implies them), and the predicate is re-applied
        row-exactly so pruning is never a correctness dependency.
        Unlike the DML forms, nondeterministic predicates are allowed
        here (one evaluation, ordinary query semantics)."""
        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        pred, candidates = self._expr_dml_candidates(
            meta, predicate, prune_hints, require_deterministic=False
        )
        return self.read_files(meta, candidates).where(pred)

    def snapshot_where_prefix(
        self, col: str, prefix: str, version: int | None = None
    ) -> DataFrame:
        """The table filtered to ``col LIKE '<prefix>%'`` with
        manifest file skipping: a prefix predicate IS a range
        predicate — [prefix, prefix + U+10FFFF) — so string min/max
        stats prune it like any between (the trick query engines play
        for LIKE with a literal prefix; works best on data range-
        clustered by the string column). Exact via the residual
        ``startswith`` filter; empty prefix degrades to a full scan."""
        from pyspark.sql import functions as F

        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        pred = F.col(col).startswith(prefix)
        if prefix:
            phys = meta.phys(col)
            keep = []
            for f in meta.files:
                rng = meta.file_stats.get(f, {}).get(phys)
                if rng is None or rng[0] is None:
                    keep.append(f)  # no range proof: conservative
                    continue
                lo, hi = rng[0], rng[1]
                # a file can hold a prefix match iff hi >= prefix and
                # lo is not past the prefix block. lo itself starting
                # with the prefix counts even when a U+10FFFF inside
                # lo sorts it above prefix+U+10FFFF (the naive range
                # check would falsely prune exactly that file)
                if (
                    not isinstance(lo, str)
                    or not isinstance(hi, str)
                    or (
                        hi >= prefix
                        and (
                            lo.startswith(prefix)
                            or lo <= prefix + "\U0010ffff"
                        )
                    )
                ):
                    keep.append(f)
        else:
            keep = list(meta.files)
        return self.read_files(meta, keep).where(pred)

    def files_matching_null(
        self, col: str, is_null: bool = True, version: int | None = None
    ) -> tuple[list[str], int]:
        """Null-predicate file skipping → (files that can contain a
        matching row, total). Stats entries carry the footer's
        null_count and row count (when the footer knows them), so
        ``IS NULL`` skips files with zero nulls and ``IS NOT NULL``
        skips all-null files — the two shapes min/max ranges cannot
        see. Files without null knowledge are conservatively kept."""
        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        keep = []
        for f in meta.files:
            rng = meta.file_stats.get(f, {}).get(meta.phys(col))
            nc = rng[2] if rng is not None and len(rng) >= 4 else None
            rows = rng[3] if rng is not None and len(rng) >= 4 else None
            if nc is None:
                keep.append(f)  # unknown -> conservative
            elif is_null and nc > 0:
                keep.append(f)
            elif not is_null and nc < rows:
                keep.append(f)
        return keep, len(meta.files)

    def snapshot_where_null(
        self, col: str, is_null: bool = True, version: int | None = None
    ) -> DataFrame:
        """The table filtered to ``col IS [NOT] NULL`` with null-count
        file skipping; exact via the residual row filter."""
        from pyspark.sql import functions as F

        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        keep, _ = self.files_matching_null(col, is_null, version)
        pred = F.col(col).isNull() if is_null else F.col(col).isNotNull()
        return self.read_files(meta, keep).where(pred)

    # ---------------------------------------------- metadata tables --

    def files_df(self, version: int | None = None) -> DataFrame:
        """The snapshot's FILES as a queryable DataFrame (Iceberg's
        ``.files`` metadata table / Delta's ``inputFiles``): path,
        size, row count, per-column [min, max] stats (as strings, the
        manifest's knowledge), deletion-vector path and deleted-row
        count. Driver-side from the already-reconstructed manifest —
        no data files are opened except DV sidecars (tiny JSON)."""
        meta = self.snapshot_meta(version)
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        rows = []
        to_logical = {v: k for k, v in meta.column_map.items()}
        for f in meta.files:
            st = {
                to_logical.get(c, c): e
                for c, e in meta.file_stats.get(f, {}).items()
            }
            dv = meta.file_dvs.get(f)
            n_deleted = (
                len(json.loads((self.root / dv).read_text())["indices"])
                if dv is not None
                else 0
            )
            n_rows = next(
                (e[3] for e in st.values() if len(e) >= 4 and e[3] is not None),
                None,
            )
            rows.append(
                (
                    f,
                    (self.root / f).stat().st_size
                    if (self.root / f).is_file()
                    else None,
                    n_rows,
                    {
                        c: [None if v is None else str(v) for v in e[:2]]
                        for c, e in st.items()
                    },
                    dv,
                    n_deleted,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "path string, size_bytes long, num_rows long, "
            "stats map<string, array<string>>, dv_path string, "
            "dv_deleted_rows long",
        )

    def history_df(self, limit: int | None = None) -> DataFrame:
        """DESCRIBE HISTORY as a DataFrame: version, operation,
        timestamp, files added/removed, operation parameters (JSON
        string — heterogeneous across operations)."""
        rows = [
            (
                h["version"],
                h["operation"],
                h["ts_ms"],
                h["n_add"],
                h["n_remove"],
                json.dumps(h["params"], sort_keys=True),
            )
            for h in self.history(limit=limit)
        ]
        return self.spark.createDataFrame(
            rows,
            "version long, operation string, ts_ms long, "
            "n_added long, n_removed long, params string",
        )

    def detail(self) -> dict:
        """DESCRIBE DETAIL: one dict of table-level facts (driver-side
        — the manifest is already in memory)."""
        meta = self.snapshot_meta()
        if meta is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        return {
            "location": str(self.root),
            "version": meta.version,
            "num_files": len(meta.files),
            "size_bytes": sum(
                (self.root / f).stat().st_size
                for f in meta.files
                if (self.root / f).is_file()
            ),
            "num_deletion_vectors": len(meta.file_dvs),
            "constraints": dict(meta.constraints),
            "schema": meta.schema().simpleString(),
            "checkpoint_interval": self.checkpoint_interval,
            "last_operation": meta.operation,
            "identity": dict(meta.identity),
            "properties": dict(meta.props),
        }

    def file_diffs(
        self, v_from: int, v_to: int
    ) -> list[tuple[int, list[str], list[str]]]:
        """Per-version manifest file diffs over (``v_from``,
        ``v_to``]: [(version, added files, removed files), ...].
        Costs ONE snapshot reconstruction (at ``v_from``) plus one
        manifest read per version — the incremental-consumer shape; a
        naive per-version ``table_changes`` loop would reconstruct two
        full snapshots (checkpoint + tail replay) for every step.
        ``v_from=0`` starts from the empty pre-table state."""
        return [
            (v, added, removed)
            for v, added, removed, _dv in self.file_and_dv_diffs(
                v_from, v_to
            )
        ]

    def file_and_dv_diffs(
        self, v_from: int, v_to: int
    ) -> list[tuple[int, list[str], list[str], dict]]:
        """:meth:`file_diffs` plus per-version DELETION-VECTOR deltas:
        each entry is (version, added, removed, dv_changed) where
        ``dv_changed`` maps a file whose vector state changed to
        ``(old dv path | None, new dv path | None)`` — files live on
        BOTH sides whose vector moved (the merge-on-read deletes a
        file-level diff alone cannot see), newly-added files that
        arrive carrying a vector (a restore re-referencing them), AND
        removed files that HAD a vector (the removed side must be
        read with it applied, or rows already MOR-deleted would be
        re-reported as deletes when their file is compacted away).
        Same cost shape: one reconstruction at ``v_from`` plus one
        manifest read per version."""
        meta = self.snapshot_meta(v_from) if v_from else None
        if meta is None and v_from != 0:
            raise FileNotFoundError(f"version {v_from} not committed")
        files: list[str] = list(meta.files) if meta else []
        dvs: dict[str, str] = dict(meta.file_dvs) if meta else {}
        out = []
        for v in range(v_from + 1, v_to + 1):
            m = self._read_manifest(v)
            op, add = m["operation"], list(m.get("add", ()))
            if op == "append":
                new = files + add
            elif op == "overwrite":
                new = add
            elif op in ("compact", "merge", "delete", "update", "restore"):
                removed = set(m.get("remove", ()))
                new = sorted(f for f in files if f not in removed) + add
            elif op in ("constraint", "schema", "stats", "props"):
                new = files
            else:  # pragma: no cover
                raise ValueError(f"unknown operation {op!r} at v{v}")
            new_dvs = {f: p for f, p in dvs.items() if f in set(new)}
            for f, p in m.get("dv", {}).items():
                if p is None:
                    new_dvs.pop(f, None)
                else:
                    new_dvs[f] = p
            dv_changed = {
                f: (dvs.get(f), new_dvs.get(f))
                for f in set(files) & set(new)
                if dvs.get(f) != new_dvs.get(f)
            }
            dv_changed.update(
                {
                    f: (None, new_dvs[f])
                    for f in set(new) - set(files)
                    if f in new_dvs
                }
            )
            dv_changed.update(
                {
                    f: (dvs[f], None)
                    for f in set(files) - set(new)
                    if f in dvs
                }
            )
            out.append(
                (v, sorted(set(new) - set(files)),
                 sorted(set(files) - set(new)), dv_changed)
            )
            files, dvs = new, new_dvs
        return out

    def table_changes(self, v_from: int, v_to: int) -> DataFrame:
        """Change data feed between two committed versions: every row
        with a ``_change_type`` column ('insert' | 'delete').

        Computed from the MANIFEST file diff — only files added or
        removed between the versions are read, so the cost scales with
        the change, not the table (the property that makes CDF usable
        for incremental downstream jobs at 100 TB). Rows present in
        both the added and removed file sets (a compaction rewrite)
        cancel via multiset difference, so a pure compact yields an
        empty feed. Row identity is whole-row value equality — an
        UPDATE therefore appears as delete + insert, like any
        copy-on-write lake without a change-tracking column."""
        from pyspark.sql import functions as F

        a, b = self.snapshot_meta(v_from), self.snapshot_meta(v_to)
        if b is None or (a is None and v_from != 0):
            raise FileNotFoundError(
                f"versions {v_from}..{v_to} not both committed"
            )
        a_files: tuple[str, ...] = a.files if a is not None else ()

        # a file live at BOTH ends whose deletion vector changed still
        # contributes a delta (the merge-on-read rows deleted between
        # the versions): read it on both sides with each side's DV
        # applied and let the multiset difference surface the rows
        dv_changed = sorted(
            f
            for f in set(a_files) & set(b.files)
            if (a.file_dvs.get(f) if a else None) != b.file_dvs.get(f)
        )
        schema = b.schema()  # widest: append-evolution is additive
        added = self.read_files(
            b, sorted(set(b.files) - set(a_files)) + dv_changed,
            schema=schema,
        )
        removed = self.read_files(
            a, sorted(set(a_files) - set(b.files)) + dv_changed,
            schema=schema,
        ) if a is not None else self.spark.createDataFrame([], schema)
        inserts = added.exceptAll(removed).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = removed.exceptAll(added).withColumn(
            "_change_type", F.lit("delete")
        )
        return inserts.unionByName(deletes)

    # ------------------------------------------------------- writes --

    def _stage(
        self, df: DataFrame, stats_cols: tuple[str, ...] = ()
    ) -> tuple[list[str], str, dict[str, dict[str, list]]]:
        """Write ``df``'s files into a fresh write-once dir; return
        (relative file paths, schema json, per-file column stats).

        Stats come from the just-written parquet FOOTERS (one metadata
        read per staged file, on the committer — the files are already
        local to it), so skipping information costs no extra pass over
        the data; only int/float/str mins and maxes are recorded, and
        a file with no usable stats simply never skips.

        Under COLUMN MAPPING the dataframe's LOGICAL columns are
        written under their PHYSICAL parquet names (stable for a
        column's lifetime, so every file — pre- or post-rename —
        agrees), the returned schema stays logical, and stats are
        keyed by physical names like every manifest entry."""
        import pyarrow.parquet as pq

        from pyspark.sql import functions as F

        base = self.snapshot_meta()
        # GENERATED columns (add_generated_column): any Spark-side
        # write path that lacks the column gets it computed here, so
        # append / overwrite / replace_where / merge inserts all
        # produce correct values without each caller knowing; a path
        # that PROVIDES the column is validated at commit instead
        # (the _commit invariant). Rewrites read full-schema rows, so
        # they never recompute — legacy null backfill rows survive
        # verbatim. Generated columns always get footer stats: file
        # skipping on the derived value is the feature's point
        # (Delta's partition-column analog).
        gens = _generated_defs(base.props) if base else {}
        if gens:
            from pyspark.errors import AnalysisException
            from pyspark.sql import functions as F

            types = {f.name: f.dataType for f in base.schema().fields}
            for c, e in sorted(gens.items()):
                if c in df.columns or c not in types:
                    continue
                try:
                    df = df.withColumn(c, F.expr(e).cast(types[c]))
                except AnalysisException as err:
                    raise ValueError(
                        f"cannot compute generated column {c!r} = "
                        f"({e}): the written dataframe lacks a column "
                        f"the expression needs ({err})"
                    ) from None
            stats_cols = tuple(
                dict.fromkeys(
                    tuple(stats_cols)
                    + tuple(c for c in sorted(gens) if c in df.columns)
                )
            )
        logical_schema_json = df.schema.json()
        cmap = dict(base.column_map) if base else {}
        if cmap:
            df = df.select(
                *[
                    F.col(c).alias(cmap.get(c, c)) for c in df.columns
                ]
            )
            stats_cols = tuple(cmap.get(c, c) for c in stats_cols)
        stage_rel = f"{_DATA_DIR}/{uuid.uuid4().hex}"
        stage_abs = self.root / stage_rel
        with _micros_ts_writes(self.spark):
            df.write.mode("errorifexists").parquet(str(stage_abs))
        # ZERO-ROW part files (empty upstream partitions) are dropped
        # from the manifest: they carry no data but — having no row
        # groups, hence no stats — would conservatively defeat every
        # stats-based skip and conflict guard that touches them. One
        # footer read per staged file, local to the committer.
        files = sorted(
            f"{stage_rel}/{p.name}"
            for p in stage_abs.iterdir()
            if p.name.endswith(".parquet")
            and pq.read_metadata(p).num_rows > 0
        )
        return files, logical_schema_json, footer_stats(
            self.root, files, stats_cols
        )

    def _stage_cdc(
        self,
        frames: list[tuple[DataFrame, str]],
        schema: StructType,
        cmap: dict[str, str],
    ) -> list[str]:
        """Stage a commit's CHANGE DATA as parquet under ``_cdc/``:
        each ``(rows, change_type)`` frame is aligned to ``schema``
        (missing columns null — merge evolution), written under
        PHYSICAL column names plus the ``_change_type`` literal, and
        the union lands in one write-once dir. Returns manifest-
        relative file paths ([] when every frame is empty); a commit
        that loses its race leaves the dir orphaned for vacuum, like
        any stage."""
        from pyspark.sql import functions as F

        out = None
        for rows, ctype in frames:
            have = set(rows.columns)
            aligned = rows.select(
                *[
                    (
                        F.col(f.name) if f.name in have
                        else F.lit(None).cast(f.dataType)
                    ).alias(cmap.get(f.name, f.name))
                    for f in schema.fields
                ],
                F.lit(ctype).alias(_CHANGE_COL),
            )
            out = aligned if out is None else out.unionByName(aligned)
        if out is None:
            return []
        import pyarrow.parquet as pq

        stage_rel = f"{_CDC_DIR}/{uuid.uuid4().hex}"
        stage_abs = self.root / stage_rel
        with _micros_ts_writes(self.spark):
            out.write.mode("errorifexists").parquet(str(stage_abs))
        return sorted(
            f"{stage_rel}/{p.name}"
            for p in stage_abs.iterdir()
            if p.name.endswith(".parquet")
            and pq.read_metadata(p).num_rows > 0
        )

    def read_cdc_files(
        self, end: Snapshot, files: list[str], schema: StructType
    ) -> DataFrame:
        """Read CHANGE DATA files staged by :meth:`_stage_cdc` back as
        LOGICAL columns (aligned to ``schema``, missing columns null)
        plus ``_change_type``. ``end`` supplies the physical name map —
        physical names are stable for a column's lifetime, so the
        newest snapshot's map resolves every span's files."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType

        read_schema = StructType(
            list(end.phys_schema(schema).fields)
            + [StructField(_CHANGE_COL, StringType(), False)]
        )
        df = self.spark.read.schema(read_schema).parquet(
            *[str(self.root / f) for f in files]
        )
        return df.select(
            *[
                F.col(end.phys(f.name)).alias(f.name)
                for f in schema.fields
            ],
            F.col(_CHANGE_COL),
        )

    def _enforce_constraints(
        self,
        staged: list[str],
        schema_json: str,
        exprs: dict[str, str],
        column_map: dict[str, str] | None = None,
    ) -> None:
        """Count CHECK violations in the staged files (read with the
        schema that will be published, so append-evolution columns the
        stage lacks read as null) — one aggregate job over Δ data
        only. SQL semantics: a row violates when the expression is
        FALSE; UNKNOWN (null) passes, like the standard's CHECK.
        ``column_map`` translates to the physical parquet names; the
        expressions see LOGICAL names.

        When the handle has NO SparkSession (the txnlake DataSource
        writer's commit runs in a session-less Python worker), the
        same counts are evaluated with DuckDB over the staged parquet
        — constraint expressions should stick to portable SQL, the
        discipline the repo's oracle harness enforces everywhere."""
        schema = StructType.fromJson(json.loads(schema_json))
        cmap = column_map or {}
        if self.spark is None:
            self._enforce_constraints_duckdb(staged, schema, exprs, cmap)
            return
        from pyspark.sql import functions as F

        read_schema = StructType(
            [
                StructField(cmap.get(f.name, f.name), f.dataType, f.nullable)
                for f in schema.fields
            ]
        ) if cmap else schema
        df = self.spark.read.schema(read_schema).parquet(
            *[str(self.root / f) for f in staged]
        )
        if cmap:
            df = df.select(
                *[
                    F.col(cmap.get(f.name, f.name)).alias(f.name)
                    for f in schema.fields
                ]
            )
        names = sorted(exprs)
        row = df.agg(
            *[
                F.count(
                    F.when(
                        ~F.coalesce(
                            F.expr(exprs[n]).cast("boolean"), F.lit(True)
                        ),
                        1,
                    )
                ).alias(f"c{i}")
                for i, n in enumerate(names)
            ]
        ).collect()[0]
        bad = {
            n: row[f"c{i}"] for i, n in enumerate(names) if row[f"c{i}"]
        }
        if bad:
            raise ConstraintViolationError(
                f"CHECK constraint(s) violated by staged rows "
                f"(name -> violating rows): {bad}"
            )

    def _enforce_constraints_duckdb(
        self,
        staged: list[str],
        schema: StructType,
        exprs: dict[str, str],
        cmap: dict[str, str],
    ) -> None:
        """Session-less CHECK validation (same semantics: FALSE
        violates, UNKNOWN passes) over the staged files via DuckDB."""
        import duckdb
        import pyarrow.parquet as pq

        paths = [str(self.root / f) for f in staged]
        present: set[str] = set()
        for p in paths:
            present.update(pq.read_metadata(p).schema.names)
        proj = ", ".join(
            (
                f'"{cmap.get(f.name, f.name)}" AS "{f.name}"'
                if cmap.get(f.name, f.name) in present
                else f'NULL AS "{f.name}"'
            )
            for f in schema.fields
        )
        con = duckdb.connect()
        bad = {}
        for n in sorted(exprs):
            cnt = con.sql(
                f"SELECT count(*) FROM (SELECT {proj} FROM "
                f"read_parquet($files, union_by_name=true)) "
                f"WHERE NOT coalesce(CAST(({exprs[n]}) AS BOOLEAN), true)",
                params={"files": paths},
            ).fetchone()[0]
            if cnt:
                bad[n] = cnt
        if bad:
            raise ConstraintViolationError(
                f"CHECK constraint(s) violated by staged rows "
                f"(name -> violating rows): {bad}"
            )

    def _publish(self, payload: dict, path: Path) -> bool:
        """Atomically create ``path``; False if lost the race.
        ``os.link`` of a completed temp file is create-if-absent:
        either the full document appears under the final name or
        nothing does — no reader ever sees a partial manifest."""
        log = self.root / _LOG_DIR
        log.mkdir(parents=True, exist_ok=True)
        tmp = log / f".tmp-{uuid.uuid4().hex}"
        # date/datetime leak into manifests only through op_params
        # audit values (e.g. a delete's timestamp ranges) — serialize
        # them in the same ISO form the stats use; anything else
        # non-JSON still fails loudly
        def _default(o):
            k = _stat_key(o)
            if k is o:  # not a time value: keep json's loud failure
                raise TypeError(
                    f"Object of type {type(o).__name__} is not JSON "
                    f"serializable"
                )
            return k

        tmp.write_text(json.dumps(payload, default=_default))
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            tmp.unlink()

    def _maybe_checkpoint(self, version: int, state: Snapshot) -> None:
        """Publish a full-snapshot checkpoint for ``version`` when the
        interval divides it. Best-effort and idempotent: EEXIST means
        another writer already checkpointed this version; a crash here
        only lengthens the next reader's manifest tail."""
        if version % self.checkpoint_interval != 0:
            return
        self._publish(
            {
                "version": version,
                "operation": state.operation,
                "files": list(state.files),
                "schema": state.schema_json,
                "writer_txns": state.writer_txns,
                "file_stats": state.file_stats,
                "constraints": state.constraints,
                "file_dvs": state.file_dvs,
                "column_map": state.column_map,
                "retired_cols": list(state.retired_cols),
                "identity": state.identity,
                "zorder_spec": state.zorder_spec,
                "props": state.props,
            },
            _ckpt_path(self.root, version),
        )
        # EEXIST still advances: the checkpoint exists either way, and
        # readers resolve latest from the pointer + forward probing
        self._advance_pointer(version)

    def _commit(
        self,
        operation: str,
        staged: list[str],
        schema_json: str,
        app_id: str | None,
        txn_seq: int | None,
        replaced: tuple[str, ...] = (),
        staged_stats: dict[str, dict[str, list]] | None = None,
        max_attempts: int = 20,
        expected_base: int | None = None,
        guard_range: tuple | None = None,
        guard_exempt: tuple[str, ...] = (),
        op_params: dict | None = None,
        constraints: dict[str, str] | None = None,
        dv_updates: dict[str, str] | None = None,
        expected_dvs: dict[str, str | None] | None = None,
        column_map: dict[str, str] | None = None,
        retired_cols: tuple[str, ...] | None = None,
        identity: dict | None = None,
        expected_identity: dict | None = None,
        zorder_spec: dict | None = None,
        expected_zorder_spec: dict | None = None,
        props: dict | None = None,
        cdc: list[str] | None = None,
    ) -> int:
        """Optimistic-concurrency commit loop. Returns the committed
        version (or the current one, for an idempotent no-op). The
        published manifest is O(Δfiles): adds + (for compact) removes,
        never the full file list.

        ``guard_range`` — (col, [(lo, hi), ...]), the legacy
        (col, lo, hi), or a dict ``{col: [(lo, hi), ...], ...}``
        meaning the CONJUNCTION of per-column range sets — extends the
        compact conflict rule for predicate-scoped overwrites: every
        base file NOT in ``replaced`` must be provably disjoint from
        the guarded region via its manifest stats, re-checked against
        the CURRENT base on every attempt — so a concurrent append of
        in-range rows (landing between the caller's snapshot and
        publish) conflicts instead of rebasing cleanly underneath with
        rows that were never replaced. Under the dict form a file is
        safe when ANY ONE guarded column's stats prove it disjoint
        from that column's ranges (it then cannot hold a row inside
        the cross-product region) — the multi-key form composite-key
        MERGE uses so a concurrent file overlapping the first key but
        provably disjoint on a later key rebases instead of spuriously
        conflicting. Files without stats for any guarded column
        conservatively conflict.

        ``guard_exempt`` — files the CALLER already examined in its own
        base snapshot and proved clean by stronger means than stats
        (e.g. merge_into's exact key probe: a file may intersect the
        source's key hull yet contain no matching key). Exempt files
        skip the stats guard; anything that appears AFTER the caller's
        snapshot (the genuinely concurrent commits the guard exists
        for) is still checked.

        ``constraints`` — publish THIS name->CHECK-expr set (the
        add/drop_constraint path); None carries the current base's set
        forward. Either way the staged files are validated against the
        set that will be published (one Spark job over Δ files only,
        cached across commit attempts), so no commit can introduce a
        violating row.

        ``dv_updates`` — {data file: new deletion-vector sidecar} for
        merge-on-read deletes. Re-checked per attempt: every target
        must still be in the base file list (a concurrent rewrite of
        it wins — its output no longer contains the positions this DV
        names) AND carry exactly the DV recorded in ``expected_dvs``
        (the one the caller unioned into its new vector; a DV that
        moved underneath would make last-writer-wins LOSE the other
        delete's rows). Violations raise ConcurrentWriteError; the
        caller re-reads and recomputes."""
        staged_stats = staged_stats or {}
        # cache key is (name, expr): a concurrent drop + re-add of the
        # SAME name with a different expression must re-validate
        validated: set[tuple[str, str]] = set()
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            base_v = base.version if base else 0
            txns = dict(base.writer_txns) if base else {}
            if app_id is not None and txn_seq is not None:
                if txns.get(app_id, -1) >= txn_seq:
                    return base_v  # replayed transaction: no-op
                txns[app_id] = txn_seq
            remove: tuple[str, ...] = ()
            # the schema this ATTEMPT would publish. Recomputed from
            # the CURRENT base every time for append AND the rewrite
            # ops: a compact/merge/delete that rebases over a
            # concurrent schema-evolving append must publish the
            # union, or readers would silently lose the new column
            # for every file (the replace_where no-affected-files bug
            # from the round-4 self-review, in its rebase form).
            attempt_schema = schema_json
            if operation == "append":
                files = (list(base.files) if base else []) + staged
                # additive evolution: committed schema is the union;
                # a type conflict aborts BEFORE publish
                if base is not None:
                    merged = merge_schemas(
                        base.schema(),
                        StructType.fromJson(json.loads(schema_json)),
                    )
                    # resurrection guard: a NEW logical column's
                    # default physical name (== itself) must collide
                    # with neither a dropped column's physical (its
                    # old data would silently reappear under the new
                    # column) nor an existing column's physical
                    if base.retired_cols or base.column_map:
                        have = set(base.schema().fieldNames())
                        taken = {
                            base.phys(c)
                            for c in have
                        } | set(base.retired_cols)
                        for f in merged.fields:
                            if f.name not in have and f.name in taken:
                                raise SchemaEvolutionError(
                                    f"column name {f.name!r} collides "
                                    f"with the physical name of a "
                                    f"dropped or renamed column; pick "
                                    f"another name (old data would "
                                    f"resurrect under it)"
                                )
                    attempt_schema = merged.json()
            elif operation == "overwrite":
                if base is not None and base.version != expected_base:
                    raise ConcurrentWriteError(
                        f"overwrite based on v{expected_base} but "
                        f"v{base.version} committed concurrently"
                    )
                files = staged
            elif operation in ("compact", "merge", "delete", "update", "restore"):
                if operation == "restore":
                    # RESTORE pins its base (any concurrent commit is
                    # state the rollback would silently erase) and
                    # publishes the restored version's schema EXACTLY
                    # (the file set becomes exactly that version's, so
                    # no union with the current schema is needed)
                    if base is None or base.version != expected_base:
                        raise ConcurrentWriteError(
                            f"restore based on v{expected_base} but "
                            f"v{base.version if base else 0} committed "
                            f"concurrently"
                        )
                elif base is not None:
                    attempt_schema = merge_schemas(
                        base.schema(),
                        StructType.fromJson(json.loads(schema_json)),
                    ).json()
                base_files = set(base.files) if base else set()
                if not set(replaced) <= base_files:
                    raise ConcurrentWriteError(
                        "compaction input files were replaced concurrently"
                    )
                if guard_range is not None:
                    if isinstance(guard_range, dict):
                        gspec = {c: list(rs) for c, rs in guard_range.items()}
                    elif len(guard_range) == 3:  # legacy (col, lo, hi)
                        gcol, glo, ghi = guard_range
                        gspec = {gcol: [(glo, ghi)]}
                    else:
                        gcol, granges = guard_range
                        gspec = {gcol: list(granges)}
                    gspec = {  # time bounds -> manifest stat form
                        c: [
                            (_stat_key(lo), _stat_key(hi))
                            for lo, hi in rs
                        ]
                        for c, rs in gspec.items()
                    }
                    fstats = base.file_stats if base else {}
                    for f in sorted(
                        base_files - set(replaced) - set(guard_exempt)
                    ):
                        st = fstats.get(f, {})
                        # the file is safe iff SOME guarded column's
                        # stats prove it disjoint from that column's
                        # ranges — then no row can sit inside the
                        # conjunction region. A missing entry or a
                        # nulls-only entry ([None, None, ...]) gives no
                        # range proof for that column.
                        safe = False
                        for c, rs in gspec.items():
                            rng = st.get(base.phys(c) if base else c)
                            if rng is not None and rng[0] is not None and all(
                                _stats_disjoint(rng, lo, hi)
                                for lo, hi in rs
                            ):
                                safe = True
                                break
                        if not safe:
                            raise ConcurrentWriteError(
                                f"concurrent commit added {f!r} which may "
                                f"contain rows in replace_where ranges "
                                f"{gspec}"
                            )
                # a rewrite was BUILT from its base's deletion-vector
                # view of the replaced files; if a concurrent MOR
                # delete moved a vector underneath, publishing would
                # resurrect those deleted rows (the rewrite read the
                # old view and drops the DV entry). Callers declare
                # the vectors they saw via expected_dvs; an undeclared
                # vector on a replaced file conservatively conflicts.
                # restore is exempt: its expected_base pin already
                # freezes the whole base.
                if operation != "restore":
                    base_dvs_now = base.file_dvs if base else {}
                    exp_r = expected_dvs or {}
                    for f in sorted(replaced):
                        if base_dvs_now.get(f) != exp_r.get(f):
                            raise ConcurrentWriteError(
                                f"deletion vector of rewrite input {f!r} "
                                f"changed concurrently; re-read and "
                                f"rebuild the rewrite"
                            )
                remove = tuple(replaced)
                files = sorted(base_files - set(replaced)) + staged
            elif operation in ("constraint", "schema", "stats", "props"):
                # metadata-only commits. expected_base pins the paths
                # whose validation covered exactly that snapshot
                # (constraint add; rename/drop, whose published schema
                # and map were derived from it); constraint drop
                # passes None and rebases
                if expected_base is not None and (
                    (base.version if base else 0) != expected_base
                ):
                    raise ConcurrentWriteError(
                        f"{operation} change based on v{expected_base} "
                        f"but v{base.version if base else 0} committed "
                        f"concurrently"
                    )
                files = list(base.files) if base else []
                if operation in ("constraint", "stats", "props"):
                    attempt_schema = base.schema_json if base else schema_json
                # op "schema" publishes the NEW logical schema passed
                # by rename/drop (attempt_schema stays schema_json)
            else:  # pragma: no cover
                raise ValueError(operation)
            attempt_cons = (
                constraints
                if constraints is not None
                else (dict(base.constraints) if base else {})
            )
            attempt_cmap = (
                column_map
                if column_map is not None
                else (dict(base.column_map) if base else {})
            )
            attempt_retired = (
                retired_cols
                if retired_cols is not None
                else (base.retired_cols if base else ())
            )
            # identity metadata MERGES over the current base instead
            # of replacing it: an appender's snapshot may predate a
            # concurrent add_identity_column, and publishing its stale
            # dict verbatim would silently erase the new column's
            # registration. A None value is an explicit REMOVAL
            # (drop/rename of an identity column).
            attempt_identity = dict(base.identity) if base else {}
            if identity is not None:
                for _ic, _ispec in identity.items():
                    if _ispec is None:
                        attempt_identity.pop(_ic, None)
                    else:
                        attempt_identity[_ic] = _ispec
            attempt_zspec = (
                zorder_spec
                if zorder_spec is not None
                else (dict(base.zorder_spec) if base else {})
            )
            # table properties MERGE over the current base like
            # identity metadata (a writer's snapshot may predate a
            # concurrent set_properties; publishing its stale dict
            # verbatim would erase the other key). A None value is an
            # explicit removal (unset_properties).
            attempt_props = dict(base.props) if base else {}
            if props is not None:
                for _pk, _pv in props.items():
                    if _pv is None:
                        attempt_props.pop(_pk, None)
                    else:
                        attempt_props[_pk] = _pv
            # Z-SPEC CAS: a writer whose _z values were computed under
            # spec S must abort if the table's spec moved (a racing
            # refreeze) — its footer stats would be interval-compared
            # under the NEW spec and could silently mis-cluster files
            # forever. Callers re-key and retry.
            if expected_zorder_spec is not None:
                cur_zspec = dict(base.zorder_spec) if base else {}
                if cur_zspec != expected_zorder_spec:
                    raise ConcurrentWriteError(
                        "zorder_spec changed concurrently (a refreeze "
                        "raced this commit); re-key the batch under "
                        "the current spec and retry"
                    )
            # IDENTITY watermark CAS: an append that allocated IDs
            # past watermark W conflicts if any concurrent commit
            # advanced it (its staged values would collide with the
            # other allocation) — the caller re-reads, re-assigns and
            # re-stages. Non-identity concurrent commits rebase fine.
            if expected_identity is not None:
                base_ident = base.identity if base else {}
                for c, exp_high in expected_identity.items():
                    cur = (base_ident.get(c) or {}).get("high")
                    if cur != exp_high:
                        raise ConcurrentWriteError(
                            f"identity watermark of {c!r} moved "
                            f"concurrently ({exp_high!r} -> {cur!r}); "
                            f"re-allocate and retry"
                        )
            elif (
                operation in ("append", "overwrite")
                and staged
                and attempt_identity
                and identity is None
            ):
                # a raw append/overwrite on an identity table that did
                # not come through an allocating path would write
                # arbitrary values for a GENERATED ALWAYS column
                # without advancing the watermark — later appends
                # would silently allocate duplicates. Fail loudly.
                raise ValueError(
                    "table has identity columns "
                    f"{sorted(attempt_identity)}; new rows must come "
                    "through TxnTable.append so values are allocated "
                    "against the watermark"
                )
            if staged and attempt_cons:
                todo = {
                    n: e for n, e in attempt_cons.items()
                    if (n, e) not in validated
                }
                if todo:
                    self._enforce_constraints(
                        staged, attempt_schema, todo, attempt_cmap
                    )
                    validated |= set(todo.items())
            # GENERATED-column invariant: every staged data file of a
            # data-shaped commit must hold, per generated column,
            # NULL-or-the-expression's-value (null = legacy backfill
            # rows carried by rewrites; see _generated_invariant_sql).
            # Rides the same Δ-files validation job as CHECK
            # constraints, cached across commit attempts. restore is
            # exempt (its adds are prior-version files under a pinned
            # base — they satisfied the invariant when first staged).
            if staged and operation in (
                "append", "overwrite", "compact", "merge", "delete",
                "update",
            ):
                gens = _generated_defs(attempt_props)
                if gens:
                    published = {
                        f.name
                        for f in StructType.fromJson(
                            json.loads(attempt_schema)
                        ).fields
                    }
                    gchecks = {
                        f"generated<{c}>": _generated_invariant_sql(c, e)
                        for c, e in gens.items()
                        if c in published
                    }
                    # NEW data (append/overwrite) must PHYSICALLY carry
                    # the column: a raw writer (txnlake datasource)
                    # that omits it would read as all-null under the
                    # published schema and slide through the invariant
                    # as silent backfill — fail loudly instead, like
                    # identity's raw-append guard. Rewrites are exempt:
                    # they re-stage full-schema rows, so the column is
                    # always physically present.
                    if operation in ("append", "overwrite") and gchecks:
                        import pyarrow.parquet as pq_mod

                        for c in sorted(gens):
                            if c not in published:
                                continue
                            phys_c = attempt_cmap.get(c, c)
                            for f in staged:
                                if phys_c not in set(
                                    pq_mod.read_schema(self.root / f).names
                                ):
                                    raise ValueError(
                                        f"staged file {f!r} lacks "
                                        f"generated column {c!r}; write "
                                        f"through TxnTable.append (which "
                                        f"computes it) or provide the "
                                        f"values explicitly"
                                    )
                    todo = {
                        n: e for n, e in gchecks.items()
                        if (n, e) not in validated
                    }
                    if todo:
                        self._enforce_constraints(
                            staged, attempt_schema, todo, attempt_cmap
                        )
                        validated |= set(todo.items())
            if dv_updates and operation != "restore":
                # (restore is exempt: its base is pinned via
                # expected_base, so no concurrent DV can move, and its
                # targets may legitimately be newly re-referenced)
                base_file_set = set(base.files) if base else set()
                base_dvs = base.file_dvs if base else {}
                exp = expected_dvs or {}
                for f in sorted(dv_updates):
                    if f not in base_file_set:
                        raise ConcurrentWriteError(
                            f"deletion-vector target {f!r} was rewritten "
                            f"or removed concurrently"
                        )
                    if base_dvs.get(f) != exp.get(f):
                        raise ConcurrentWriteError(
                            f"deletion vector of {f!r} changed "
                            f"concurrently; recompute the union against "
                            f"the new vector"
                        )
            manifest = {
                "version": base_v + 1,
                "operation": operation,
                # wall-clock commit time for TIMESTAMP AS OF reads;
                # advisory like Delta's (writer clocks can disagree —
                # version_as_of tolerates non-monotone stamps)
                "ts_ms": int(time.time() * 1000),
                "add": staged,
                "remove": list(remove),
                "schema": attempt_schema,
                "writer_txns": txns,
                "add_stats": staged_stats,
                # audit trail (Delta's operationParameters): WHAT the
                # operation was scoped to, for history() readers —
                # purely informational, never consulted on replay
                "params": op_params or {},
                "constraints": attempt_cons,
                "dv": dv_updates or {},
                "column_map": attempt_cmap,
                "retired_cols": list(attempt_retired),
                "identity": attempt_identity,
                "zorder_spec": attempt_zspec,
                "props": attempt_props,
                # per-version CHANGE DATA files (CDF): parquet under
                # _cdc/ holding this commit's row-level changes with
                # _change_type attribution — never part of the table
                # state, so manifests carry them but snapshots and
                # checkpoints do not
                "cdc": list(cdc or ()),
            }
            if self._publish(manifest, _manifest_path(self.root, base_v + 1)):
                # a commit that WIDENED column types invalidates those
                # columns' bloom sidecars: the engine hash the filters
                # were built with is type-dependent, and probing a
                # widened column against a narrow-typed filter would
                # produce FALSE NEGATIVES (wrongly skipped files).
                # Retire them best-effort after the publish; probes
                # tolerate the race (missing/changed docs are
                # conservatively kept) and also ignore docs stamped
                # with a different dtype.
                if base is not None:
                    old_types = {
                        f.name: f.dataType for f in base.schema().fields
                    }
                    widened = [
                        f.name
                        for f in StructType.fromJson(
                            json.loads(attempt_schema)
                        ).fields
                        if f.name in old_types
                        and f.dataType != old_types[f.name]
                    ]
                    for c in widened:
                        phys_c = base.phys(c)
                        for f in base.files:
                            parts = f.split("/")
                            rel = (
                                "/".join(parts[1:])
                                if parts[0] == "data"
                                else f
                            )
                            (
                                self.root / "_bloom" / f"{rel}.{phys_c}.json"
                            ).unlink(missing_ok=True)
                live = set(files)
                carried = (
                    {f: s for f, s in base.file_stats.items() if f in live}
                    if base and operation != "overwrite"
                    else {}
                )
                carried_dvs = (
                    {f: p for f, p in base.file_dvs.items() if f in live}
                    if base and operation != "overwrite"
                    else {}
                )
                for f, p in (dv_updates or {}).items():
                    if p is None:
                        carried_dvs.pop(f, None)
                    else:
                        carried_dvs[f] = p
                self._maybe_checkpoint(
                    base_v + 1,
                    Snapshot(
                        version=base_v + 1,
                        operation=operation,
                        files=tuple(files),
                        schema_json=attempt_schema,
                        writer_txns=txns,
                        file_stats={**carried, **staged_stats},
                        constraints=attempt_cons,
                        file_dvs=carried_dvs,
                        column_map=attempt_cmap,
                        retired_cols=tuple(attempt_retired),
                        identity=attempt_identity,
                        zorder_spec=attempt_zspec,
                        props=attempt_props,
                    ),
                )
                return base_v + 1
            # lost the race -> loop rebases on the new latest snapshot
        raise ConcurrentWriteError(
            f"gave up after {max_attempts} contended commit attempts"
        )

    def append(
        self,
        df: DataFrame,
        app_id: str | None = None,
        txn_seq: int | None = None,
        stats_cols: tuple[str, ...] = (),
        op_params: dict | None = None,
    ) -> int:
        """Append ``df`` as a new version. With (app_id, txn_seq), the
        append is idempotent: replaying an already-applied seq is a
        no-op (exactly-once under at-least-once drivers). New columns
        widen the table schema additively (old files read null);
        changing a column's type raises SchemaEvolutionError.
        ``stats_cols`` records per-file min/max in the manifest for
        :meth:`snapshot_where` file skipping.

        On a table with IDENTITY columns (see
        :meth:`add_identity_column`) the values are GENERATED ALWAYS:
        ``df`` must not contain the column; the append allocates
        values past the watermark shuffle-free
        (``monotonically_increasing_id`` offsets — unique, not dense)
        and CAS-advances the watermark at commit. A concurrent
        identity-advancing append triggers re-allocation + re-stage
        (bounded retries); any other concurrent commit rebases as
        usual. The new watermark comes from the staged parquet
        FOOTERS (the identity column is forced into ``stats_cols``),
        so allocation costs no extra job."""
        # cheap identity peek: every round-5+ manifest carries the
        # FULL identity dict, so one manifest read answers "does this
        # table allocate keys" without a snapshot reconstruction —
        # the non-identity append hot path costs one extra small GET,
        # not a checkpoint replay. (Pre-feature manifests lack the
        # key, and identity could not exist then.)
        v = self.latest_version()
        ident: dict = {}
        if v > 0:
            ident = dict(self._read_manifest(v).get("identity") or {})
        if not ident:
            staged, schema_json, stats = self._stage(df, stats_cols)
            return self._commit(
                "append", staged, schema_json, app_id, txn_seq,
                staged_stats=stats, op_params=op_params,
            )
        return self._append_identity(
            df, ident, app_id, txn_seq, stats_cols, op_params=op_params
        )

    def _append_identity(
        self,
        df: DataFrame,
        ident: dict,
        app_id: str | None,
        txn_seq: int | None,
        stats_cols: tuple[str, ...],
        max_attempts: int = 20,
        op_params: dict | None = None,
    ) -> int:
        from pyspark.sql import functions as F

        clash = [c for c in ident if c in df.columns]
        if clash:
            raise ValueError(
                f"identity columns {sorted(clash)} are GENERATED "
                f"ALWAYS; the appended dataframe must not provide them"
            )
        eff_stats = tuple(dict.fromkeys(tuple(stats_cols) + tuple(ident)))
        last_err: ConcurrentWriteError | None = None
        for attempt in range(max_attempts):
            if attempt:
                # each retry re-runs a staging job, so contention is
                # expensive; a short linear backoff decorrelates
                # racing writers (jitter comes from job scheduling)
                time.sleep(min(0.05 * attempt, 1.0))
            meta = self.snapshot_meta()
            cur = dict(meta.identity) if meta is not None else dict(ident)
            out = df
            expected: dict = {}
            for col, spec in cur.items():
                start, step = int(spec["start"]), int(spec["step"])
                high = spec.get("high")
                expected[col] = high
                # first allocation lands at-or-past `start` (mid 0
                # belongs to whichever row sits first in partition 0,
                # which may be empty); later ones step past the
                # recorded watermark. mid is unique per row
                # (partition << 33 | row), so values are unique and
                # monotone in step direction — with gaps, like Delta.
                base_val = start - step if high is None else int(high)
                out = out.withColumn(
                    col,
                    (
                        F.lit(base_val)
                        + F.lit(step)
                        * (F.monotonically_increasing_id() + 1)
                    ).cast("long"),
                )
            staged, schema_json, stats = self._stage(out, eff_stats)
            new_ident = dict(cur)
            for col, spec in cur.items():
                step = int(spec["step"])
                phys = meta.phys(col) if meta is not None else col
                seen = [
                    st[phys][1 if step > 0 else 0]
                    for st in stats.values()
                    if st.get(phys) is not None
                    and st[phys][0] is not None
                ]
                if not seen:
                    continue  # zero-row append: watermark unchanged
                far = max(seen) if step > 0 else min(seen)
                near = min(seen) if step > 0 else max(seen)
                start = int(spec["start"])
                base_val = (
                    start - step if spec.get("high") is None
                    else int(spec["high"])
                )
                # wraparound/exhaustion guard: every allocated value
                # must sit strictly PAST the watermark in step
                # direction (a 64-bit wrap lands on the wrong side),
                # and the key space must not approach Long.MAX — fail
                # loudly instead of committing colliding "unique" keys
                if (
                    (step > 0 and (near <= base_val or far > (1 << 62)))
                    or (step < 0 and (near >= base_val or far < -(1 << 62)))
                ):
                    raise ValueError(
                        f"identity allocation for {col!r} overflowed "
                        f"or nearly exhausted the 64-bit key space "
                        f"(watermark {base_val}, allocated "
                        f"[{min(seen)}, {max(seen)}])"
                    )
                old = spec.get("high")
                new_ident[col] = {
                    **spec,
                    "high": far
                    if old is None
                    else (max(old, far) if step > 0 else min(old, far)),
                }
            try:
                return self._commit(
                    "append",
                    staged,
                    schema_json,
                    app_id,
                    txn_seq,
                    staged_stats=stats,
                    identity=new_ident,
                    expected_identity=expected,
                    op_params=op_params,
                )
            except ConcurrentWriteError as e:
                last_err = e  # stale allocation: orphaned stage files
                continue  # are invisible and vacuumed; re-allocate
        raise ConcurrentWriteError(
            f"gave up identity append after {max_attempts} contended "
            f"attempts"
        ) from last_err

    def overwrite(
        self,
        df: DataFrame,
        app_id: str | None = None,
        txn_seq: int | None = None,
        stats_cols: tuple[str, ...] = (),
        expected_base: int | None = None,
        op_params: dict | None = None,
    ) -> int:
        """Replace the table contents. Aborts with
        :class:`ConcurrentWriteError` if ANY other commit lands between
        reading the base version and publishing — an overwrite
        logically invalidates every concurrent change, so it must not
        silently clobber them (Delta's WriteSerializable rule).

        The base version is captured in a local and threaded through as
        an explicit ``_commit`` argument — handles stay stateless, so
        two threads sharing one handle each validate against their OWN
        base rather than whichever one wrote the attribute last.
        Callers whose ``df`` derives from an earlier read of THIS table
        (read-modify-write, e.g. matview merges) pass that read's
        version as ``expected_base`` so a commit that landed between
        their read and this call conflicts instead of being silently
        based on stale data."""
        if expected_base is None:
            expected_base = self.latest_version()
        staged, schema_json, stats = self._stage(df, stats_cols)
        return self._commit(
            "overwrite",
            staged,
            schema_json,
            app_id,
            txn_seq,
            staged_stats=stats,
            expected_base=expected_base,
            op_params=op_params,
        )

    def replace_where(
        self,
        df: DataFrame,
        col: str,
        lo,
        hi,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
        expected_base: int | None = None,
    ) -> int:
        """Predicate-scoped overwrite (Delta's ``replaceWhere``): all
        existing rows with ``lo <= col <= hi`` are replaced by ``df``,
        rows outside the range are untouched — the idempotent
        'reprocess one day/partition' backfill, with ACID publish.

        ``df`` must itself satisfy the predicate. The check runs over
        the STAGED parquet, not ``df``: a non-deterministic input
        (sampled / rand-derived) could pass a pre-stage check yet
        stage different rows, silently widening the replaced range —
        staging first pins the exact rows being published, and the
        validation read is one ``limit(1)`` over files local to the
        committer (no second evaluation of ``df``).

        File handling composes the manifest stats with the commit
        protocol: files whose recorded [min, max] is DISJOINT from the
        range survive untouched; every other file (intersecting, or
        without stats for ``col``) is read, its out-of-range rows
        rewritten alongside the new data, and the originals dropped —
        a compact of the affected files plus the new rows. The
        CONFLICT RULE is compaction's PLUS a predicate guard
        re-checked on every (re)base: any concurrent commit that added
        a file which may contain rows in [lo, hi] (intersecting stats,
        or no stats for ``col`` — conservatively conflicting) aborts
        with :class:`ConcurrentWriteError`, because those rows would
        survive unreplaced and silently break the "all existing rows
        in range are replaced" contract (Delta raises
        ConcurrentAppendException for exactly this). Appends of
        provably disjoint data rebase cleanly underneath, like any
        compact.

        At 100 TB the stats pruning is the point: a one-day backfill
        touches the files that can contain that day, not the table.

        ``(app_id, txn_seq)`` gives the commit the same idempotent-
        writer watermark as append/overwrite (a replayed seq no-ops).
        ``expected_base`` closes the read-modify-write window for
        callers whose ``df`` derives from an earlier read of THIS
        table (e.g. a matview range refresh): if any commit landed
        between that read and this call, abort instead of silently
        merging against stale in-range contents — from the captured
        base onward, the file-conflict machinery takes over."""
        return self.replace_where_ranges(
            df,
            col,
            [(lo, hi)],
            stats_cols=stats_cols,
            app_id=app_id,
            txn_seq=txn_seq,
            expected_base=expected_base,
        )

    def replace_where_ranges(
        self,
        df: DataFrame,
        col: str,
        ranges,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
        expected_base: int | None = None,
    ) -> int:
        """Multi-range form of :meth:`replace_where`: rows with
        ``col`` inside ANY of the [lo, hi] ``ranges`` are replaced by
        ``df`` in ONE atomic commit (one watermark, one conflict
        scope). This is what a scattered backfill needs: a delta
        touching keys {5, 6} and {10⁹, 10⁹+1} replaces two tight
        ranges instead of the hull between them — files in the
        untouched middle band are never read, rewritten, or guarded
        against. Validation, file pruning, and the concurrent-append
        guard all operate on the UNION of ranges; everything else
        (stage-first validation, compaction conflict rule, idempotent
        watermark, expected_base) is inherited unchanged."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        ranges = [tuple(r) for r in ranges]
        if not ranges:
            raise ValueError("replace_where_ranges needs >= 1 range")
        base = self.snapshot_meta()
        if base is not None and base.identity:
            raise ValueError(
                "replace_where on a table with identity columns "
                f"{sorted(base.identity)} would write arbitrary "
                "values for a GENERATED ALWAYS column; drop the "
                "identity column or use delete + append"
            )
        if expected_base is not None and (
            base.version if base else 0
        ) != expected_base:
            raise ConcurrentWriteError(
                f"replace_where based on v{expected_base} but "
                f"v{base.version if base else 0} is committed"
            )
        pred = reduce(
            or_, [F.col(col).between(lo, hi) for lo, hi in ranges]
        )
        cdf_on = base is not None and base.props.get(_CDF_PROP) == "true"
        staged_new, schema_new, stats_new = self._stage(df, stats_cols)
        new_rows = None
        if staged_new:
            new_schema = StructType.fromJson(json.loads(schema_new))
            staged_df = self.spark.read.schema(new_schema).parquet(
                *[str(self.root / f) for f in staged_new]
            )
            bad = (
                staged_df.where(~pred | F.col(col).isNull()).limit(1).count()
            )
            if bad:
                shutil.rmtree((self.root / staged_new[0]).parent)
                raise ValueError(
                    f"replace_where data contains rows outside "
                    f"{col} in {ranges}"
                )
            new_rows = staged_df  # reads back the pinned staged files
        guard = (col, ranges)
        affected: list[str] = []
        keep_rows = None
        old = None
        if base is not None and base.files:
            affected = self.files_matching_any(col, ranges, base.version)
            if affected:
                old = self.read_files(base, affected)
                keep_rows = old.where(~pred | F.col(col).isNull())
        if keep_rows is None:
            # even with no affected files the committed schema must be
            # the MERGE with the base: a 'compact' manifest's schema is
            # what every reader uses for ALL files, and publishing only
            # df's (possibly narrower) schema would silently drop the
            # base's other columns from every subsequent read
            if base is not None:
                schema_new = merge_schemas(
                    base.schema(),
                    StructType.fromJson(json.loads(schema_new)),
                ).json()
            cdc = None
            if cdf_on:
                # no in-range files existed: the whole change is the
                # inserted data (possibly nothing)
                cdc = self._stage_cdc(
                    [(new_rows, "insert")] if new_rows is not None else [],
                    StructType.fromJson(json.loads(schema_new)),
                    base.column_map if base else {},
                )
            return self._commit(
                "compact",
                staged_new,
                schema_new,
                app_id,
                txn_seq,
                staged_stats=stats_new,
                guard_range=guard,
                op_params={"replace_where": {"col": col, "ranges": ranges}},
                cdc=cdc,
            )
        staged_keep, schema_keep, stats_keep = self._stage(
            keep_rows, stats_cols
        )
        schema_json = merge_schemas(
            StructType.fromJson(json.loads(schema_keep)),
            StructType.fromJson(json.loads(schema_new)),
        ).json()
        cdc = None
        if cdf_on:
            # replaced content = the in-range rows of affected files
            # (out-of-range survivors merely move files: no change);
            # inserts = the staged new data, read back pinned
            frames = [(old.where(pred), "delete")]
            if new_rows is not None:
                frames.append((new_rows, "insert"))
            cdc = self._stage_cdc(
                frames,
                StructType.fromJson(json.loads(schema_json)),
                base.column_map,
            )
        return self._commit(
            "compact",
            staged_keep + staged_new,
            schema_json,
            app_id,
            txn_seq,
            replaced=tuple(affected),
            expected_dvs={f: base.file_dvs.get(f) for f in affected},
            staged_stats={**stats_keep, **stats_new},
            guard_range=guard,
            op_params={"replace_where": {"col": col, "ranges": ranges}},
            cdc=cdc,
        )

    def delete_where(
        self,
        col: str,
        lo,
        hi,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Row-level DELETE of ``lo <= col <= hi`` (single-range form
        of :meth:`delete_where_ranges`)."""
        return self.delete_where_ranges(
            col, [(lo, hi)], stats_cols=stats_cols, app_id=app_id,
            txn_seq=txn_seq,
        )

    def delete_where_ranges(
        self,
        col: str,
        ranges,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Row-level DELETE: remove every row with ``col`` inside ANY
        of the [lo, hi] ``ranges``, copy-on-write. Manifest stats prune
        first — only files whose [min, max] can intersect a range are
        read and rewritten (their surviving rows re-staged, originals
        dropped); disjoint files are never touched, so a delete of one
        day from a 100 TB table costs O(that day's files).

        CONFLICT RULE is plain compaction's, deliberately WITHOUT
        replace_where's append guard: DELETE removes the matching rows
        *as of its snapshot* — a concurrent append of in-range rows is
        a later change that legitimately survives (Delta's DELETE
        rebases over blind appends too; only writers that rewrote the
        same files conflict). Contrast replace_where, whose contract
        ("range content == df afterward") is violated by exactly such
        appends and therefore must conflict with them.

        Files without stats for ``col`` are conservatively read and
        rewritten (their non-matching rows survive verbatim), so the
        result is exact either way. A delete matching no file is a
        no-op that commits nothing and records no watermark."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        ranges = [tuple(r) for r in ranges]
        if not ranges:
            raise ValueError("delete_where_ranges needs >= 1 range")
        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        affected = self.files_matching_any(col, ranges, base.version)
        if not affected:
            return base.version
        pred = reduce(
            or_, [F.col(col).between(lo, hi) for lo, hi in ranges]
        )
        cdf_on = base.props.get(_CDF_PROP) == "true"
        old = self.read_files(base, affected)
        if cdf_on:
            # one scan feeds both the survivor rewrite and the change
            # rows; the deleted set is the predicate-TRUE complement
            old = old.persist()
        try:
            keep_rows = old.where(~pred | F.col(col).isNull())
            staged, schema_json, stats = self._stage(keep_rows, stats_cols)
            cdc = (
                self._stage_cdc(
                    [(old.where(pred), "delete")],
                    base.schema(),
                    base.column_map,
                )
                if cdf_on
                else None
            )
        finally:
            if cdf_on:
                old.unpersist()
        return self._commit(
            "delete",
            staged,
            base.schema().json(),  # a delete never narrows the schema
            app_id,
            txn_seq,
            replaced=tuple(affected),
            expected_dvs={f: base.file_dvs.get(f) for f in affected},
            staged_stats=stats,
            op_params={"col": col, "ranges": ranges},
            cdc=cdc,
        )

    def _reject_generated_sets(
        self, base: Snapshot, set_exprs: dict[str, str]
    ) -> dict[str, str]:
        """UPDATE validation shared by every COW/MOR form: a GENERATED
        ALWAYS column cannot be SET directly (it is recomputed when a
        SET touches one of its referenced columns — Delta's rule).
        Returns the table's generation definitions for the transform
        builder."""
        gens = _generated_defs(base.props)
        g = sorted(set(set_exprs) & set(gens))
        if g:
            raise ValueError(
                f"column(s) {g} are GENERATED ALWAYS AS (expr) and "
                f"cannot be SET; they are recomputed automatically "
                f"when a SET expr touches a referenced column"
            )
        return gens

    def _update_transform(
        self,
        old: DataFrame,
        hit,
        set_exprs: dict[str, str],
        schema: StructType,
        gens: dict[str, str],
    ) -> DataFrame:
        """Apply an UPDATE's SET exprs to ``old`` under boolean column
        expression ``hit`` (rows where it is FALSE or NULL survive
        verbatim), then recompute any GENERATED column whose
        expression references a SET-target column — evaluated on the
        POST-SET row, Delta's generated-column update semantics. The
        SET exprs themselves see pre-update values (SQL's parallel
        assignment); ``hit`` is evaluated once on the original row, so
        a SET expr may rewrite the predicate column safely. Extra
        non-schema columns on ``old`` are dropped."""
        from pyspark.sql import functions as F

        tmp = "__upd_hit"
        while tmp in {f.name for f in schema.fields}:  # user column clash
            tmp += "_"
        out = old.select(
            *[F.col(f.name) for f in schema.fields], hit.alias(tmp)
        )
        out = out.select(
            *[
                F.when(
                    F.col(tmp),
                    F.expr(set_exprs[f.name]).cast(f.dataType),
                ).otherwise(F.col(f.name)).alias(f.name)
                if f.name in set_exprs
                else F.col(f.name)
                for f in schema.fields
            ],
            F.col(tmp),
        )
        recompute = {
            g: e
            for g, e in gens.items()
            if any(_expr_refs(e, t) for t in set_exprs)
        }
        if recompute:
            out = out.select(
                *[
                    F.when(
                        F.col(tmp),
                        F.expr(recompute[f.name]).cast(f.dataType),
                    ).otherwise(F.col(f.name)).alias(f.name)
                    if f.name in recompute
                    else F.col(f.name)
                    for f in schema.fields
                ],
                F.col(tmp),
            )
        return out.select(*[F.col(f.name) for f in schema.fields])

    def update_where(
        self,
        col: str,
        lo,
        hi,
        set_exprs: dict[str, str],
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Row-level UPDATE of ``lo <= col <= hi`` (single-range form
        of :meth:`update_where_ranges`)."""
        return self.update_where_ranges(
            col, [(lo, hi)], set_exprs, stats_cols=stats_cols,
            app_id=app_id, txn_seq=txn_seq,
        )

    def update_where_ranges(
        self,
        col: str,
        ranges,
        set_exprs: dict[str, str],
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Row-level UPDATE: apply ``set_exprs`` ({column: SQL expr
        over the row}) to every row with ``col`` inside ANY of the
        [lo, hi] ``ranges``, copy-on-write — SQL's ``UPDATE t SET ...
        WHERE col IN ranges`` (Delta's UPDATE shape). Manifest stats
        prune first, exactly like :meth:`delete_where_ranges`: only
        files whose [min, max] can intersect a range are read and
        rewritten; non-matching rows inside them survive verbatim;
        disjoint files are never touched.

        CONFLICT RULE is delete's (plain compaction, no append guard):
        UPDATE transforms the matching rows *as of its snapshot*; a
        concurrent append of in-range rows legitimately survives
        un-updated, while a concurrent rewrite of the same files
        conflicts. Expressions are validated against the schema before
        any job runs; results cast back to each column's type, so a
        commit can never silently change the schema. No matching file
        -> no-op, nothing committed."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        ranges = [tuple(r) for r in ranges]
        if not ranges:
            raise ValueError("update_where_ranges needs >= 1 range")
        if not set_exprs:
            raise ValueError("update_where_ranges needs >= 1 SET expr")
        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        schema = base.schema()
        bad = set(set_exprs) - set(schema.fieldNames())
        if bad:
            raise ValueError(f"SET exprs for unknown columns {sorted(bad)}")
        id_set = set(set_exprs) & set(base.identity)
        if id_set:
            raise ValueError(
                f"identity columns {sorted(id_set)} are GENERATED "
                f"ALWAYS and cannot be SET"
            )
        gens = self._reject_generated_sets(base, set_exprs)
        affected = self.files_matching_any(col, ranges, base.version)
        if not affected:
            return base.version
        hit = reduce(
            or_, [F.col(col).between(lo, hi) for lo, hi in ranges]
        ) & F.col(col).isNotNull()
        cdf_on = base.props.get(_CDF_PROP) == "true"
        old = self.read_files(base, affected)
        if cdf_on:
            old = old.persist()
        try:
            out = self._update_transform(old, hit, set_exprs, schema, gens)
            staged, _schema_json, stats = self._stage(out, stats_cols)
            cdc = None
            if cdf_on:
                pre = old.where(hit)
                # the postimage applies the SAME transform to the hit
                # rows (never re-deriving `hit` from transformed
                # values — a SET expr may rewrite the predicate column)
                cdc = self._stage_cdc(
                    [
                        (pre, "update_preimage"),
                        (
                            self._update_transform(
                                pre, F.lit(True), set_exprs, schema, gens
                            ),
                            "update_postimage",
                        ),
                    ],
                    schema,
                    base.column_map,
                )
        finally:
            if cdf_on:
                old.unpersist()
        return self._commit(
            "update",
            staged,
            schema.json(),  # SET exprs cast back: schema is invariant
            app_id,
            txn_seq,
            replaced=tuple(affected),
            expected_dvs={f: base.file_dvs.get(f) for f in affected},
            staged_stats=stats,
            op_params={
                "col": col,
                "ranges": ranges,
                "set": sorted(set_exprs),
            },
            cdc=cdc,
        )

    def _expr_dml_candidates(
        self,
        base: Snapshot,
        predicate: str,
        prune_hints: dict | None,
        require_deterministic: bool = True,
    ):
        """Shared planning for arbitrary-SQL-predicate DML
        (:meth:`delete_where_expr` / :meth:`update_where_expr`):
        validate the predicate against the snapshot schema (analysis
        errors raise BEFORE any job runs), apply optional prune
        hints, and return (pred, candidate_files).

        ``prune_hints`` is ``{col: [(lo, hi), ...]}`` — a promise by
        the caller that every row satisfying ``predicate`` has, for
        EACH hinted column, its value inside one of that column's
        ranges. Candidates are then manifest-stats pruned per column
        (disjunction of ranges within a column, conjunction across
        columns) exactly like :meth:`files_matching`; without hints
        every file is a candidate (conservative — an arbitrary
        expression can't be evaluated against min/max stats), and the
        touched-file probe in the caller still bounds the REWRITE to
        files actually containing a match, so the conservative cost
        is one scan, not a table rewrite. A WRONG hint (ranges the
        predicate does not imply) silently misses rows — it is a
        pruning contract, not a filter."""
        from pyspark.sql import functions as F

        schema = base.schema()
        known = set(schema.fieldNames())
        bad = set(prune_hints or {}) - known
        if bad:
            raise ValueError(f"prune hints for unknown columns {sorted(bad)}")
        pred = F.expr(predicate)
        # force analysis against the logical schema now, so a typo'd
        # column or non-boolean expression fails fast and client-side
        probe = self.spark.createDataFrame([], schema).where(pred)
        if probe.schema.fieldNames() != schema.fieldNames():
            raise ValueError("predicate altered the schema")  # unreachable
        # DML evaluates the predicate in TWO jobs (touched-file probe,
        # then rewrite); a nondeterministic predicate would delete or
        # update a row set matching no single evaluation — reject it,
        # like Delta. (Time-valued functions such as current_timestamp
        # are query-deterministic and pass this check, but each
        # internal job resolves its own clock: pass a literal instead.)
        deterministic = True
        if require_deterministic:  # reads evaluate once: anything goes
            try:
                exprs = (
                    probe._jdf.queryExecution().analyzed().expressions()
                )
                deterministic = all(
                    exprs.apply(i).deterministic()
                    for i in range(exprs.size())
                )
            except Exception:  # pragma: no cover - introspection moved
                deterministic = True  # best-effort: never block analysis
        if not deterministic:
            raise ValueError(
                f"nondeterministic predicate {predicate!r} is not "
                f"allowed in DELETE/UPDATE (it would evaluate "
                f"differently in the probe and rewrite passes)"
            )
        candidates = list(base.files)
        for col, ranges in (prune_hints or {}).items():
            per_col = set(
                self.files_matching_any(
                    col, [tuple(r) for r in ranges], base.version
                )
            )
            candidates = [f for f in candidates if f in per_col]
        return pred, candidates

    def _expr_touched_files(
        self, base: Snapshot, pred, candidates: list[str]
    ) -> list[str]:
        """One scan of the candidate files: which contain at least one
        row where ``pred`` is TRUE (the files a predicate DML must
        rewrite). The collect is bounded by the candidate FILE count,
        not row count; manifest order is preserved."""
        touched_rows = (
            self.read_files(base, candidates, keep_file_col="__file")
            .where(pred)
            .select("__file")
            .distinct()
            .collect()
        )
        touched_set = {r["__file"] for r in touched_rows}
        return [f for f in candidates if f in touched_set]

    def delete_where_expr(
        self,
        predicate: str,
        prune_hints: dict | None = None,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Row-level DELETE with an ARBITRARY SQL predicate — the
        general form a user types first (``DELETE FROM t WHERE
        <expr>``, Delta's semantics; round-4 verdict #3). Two-pass,
        like MERGE:

        1. **Prune + probe.** Candidate files (all files, or the
           ``prune_hints`` stats-pruned subset — see
           :meth:`_expr_dml_candidates`) are scanned ONCE with the
           predicate; files containing at least one TRUE row are the
           touched set. The probe projects only the file column after
           the filter, so column pruning keeps it cheap.
        2. **Rewrite.** Only touched files are rewritten (surviving
           rows = predicate FALSE or NULL, SQL's DELETE semantics);
           untouched candidates keep their bytes and their manifest
           stats.

        Conflict rule, replay, and CDF shape are exactly
        :meth:`delete_where_ranges`'s (no append guard — DELETE
        applies to its snapshot). Matching no rows commits nothing."""
        from pyspark.sql import functions as F

        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        pred, candidates = self._expr_dml_candidates(
            base, predicate, prune_hints
        )
        if not candidates:
            return base.version
        touched = self._expr_touched_files(base, pred, candidates)
        if not touched:
            return base.version
        cdf_on = base.props.get(_CDF_PROP) == "true"
        old = self.read_files(base, touched)
        if cdf_on:
            old = old.persist()
        try:
            keep_rows = old.where(~pred | pred.isNull())
            staged, _schema_json, stats = self._stage(keep_rows, stats_cols)
            cdc = (
                self._stage_cdc(
                    [(old.where(pred), "delete")],
                    base.schema(),
                    base.column_map,
                )
                if cdf_on
                else None
            )
        finally:
            if cdf_on:
                old.unpersist()
        return self._commit(
            "delete",
            staged,
            base.schema().json(),  # a delete never narrows the schema
            app_id,
            txn_seq,
            replaced=tuple(touched),
            expected_dvs={f: base.file_dvs.get(f) for f in touched},
            staged_stats=stats,
            op_params={
                "predicate": predicate,
                "hints": {
                    c: [list(r) for r in rs]
                    for c, rs in (prune_hints or {}).items()
                },
            },
            cdc=cdc,
        )

    def update_where_expr(
        self,
        predicate: str,
        set_exprs: dict[str, str],
        prune_hints: dict | None = None,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
    ) -> int:
        """Row-level UPDATE with an ARBITRARY SQL predicate (``UPDATE
        t SET ... WHERE <expr>``; round-4 verdict #3): the
        generalized companion of :meth:`update_where_ranges`, planned
        exactly like :meth:`delete_where_expr` (prune hints →
        touched-file probe → rewrite only files containing a TRUE
        row). Rows where the predicate is FALSE or NULL survive
        verbatim — including inside rewritten files. ``set_exprs``
        results are cast back to each column's type (schema
        invariant); validation happens before any job. Conflict rule
        and replay are :meth:`update_where_ranges`'s."""
        from pyspark.sql import functions as F

        if not set_exprs:
            raise ValueError("update_where_expr needs >= 1 SET expr")
        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        schema = base.schema()
        bad = set(set_exprs) - set(schema.fieldNames())
        if bad:
            raise ValueError(f"SET exprs for unknown columns {sorted(bad)}")
        id_set = set(set_exprs) & set(base.identity)
        if id_set:
            raise ValueError(
                f"identity columns {sorted(id_set)} are GENERATED "
                f"ALWAYS and cannot be SET"
            )
        gens = self._reject_generated_sets(base, set_exprs)
        pred, candidates = self._expr_dml_candidates(
            base, predicate, prune_hints
        )
        if not candidates:
            return base.version
        touched = self._expr_touched_files(base, pred, candidates)
        if not touched:
            return base.version
        cdf_on = base.props.get(_CDF_PROP) == "true"
        old = self.read_files(base, touched)
        if cdf_on:
            old = old.persist()
        try:
            out = self._update_transform(old, pred, set_exprs, schema, gens)
            staged, _schema_json, stats = self._stage(out, stats_cols)
            cdc = None
            if cdf_on:
                # hit rows = predicate TRUE (FALSE/NULL rows survive
                # verbatim and produce no change rows)
                pre = old.where(pred)
                cdc = self._stage_cdc(
                    [
                        (pre, "update_preimage"),
                        (
                            self._update_transform(
                                pre, F.lit(True), set_exprs, schema, gens
                            ),
                            "update_postimage",
                        ),
                    ],
                    schema,
                    base.column_map,
                )
        finally:
            if cdf_on:
                old.unpersist()
        return self._commit(
            "update",
            staged,
            schema.json(),  # SET exprs cast back: schema is invariant
            app_id,
            txn_seq,
            replaced=tuple(touched),
            expected_dvs={f: base.file_dvs.get(f) for f in touched},
            staged_stats=stats,
            op_params={
                "predicate": predicate,
                "set": sorted(set_exprs),
                "hints": {
                    c: [list(r) for r in rs]
                    for c, rs in (prune_hints or {}).items()
                },
            },
            cdc=cdc,
        )

    def add_identity_column(
        self, name: str, start: int = 1, step: int = 1
    ) -> int:
        """ALTER TABLE ADD COLUMN ``name`` BIGINT GENERATED ALWAYS AS
        IDENTITY (START WITH ``start`` STEP ``step``) — the 100 TB
        surrogate-key answer (quirk Q8, round-4 verdict #5): appends
        allocate unique keys SHUFFLE-FREE (no row_number sort, no
        per-group hotspot), with uniqueness guaranteed across
        concurrent writers by the manifest watermark CAS instead of a
        global sort. Values are unique and monotone in step direction
        but NOT dense — failed attempts and partition-sparse
        allocation burn ranges, exactly Delta's identity contract.

        The column is added to the schema as a nullable BIGINT; rows
        in EXISTING files read NULL for it (this engine allows adding
        identity to a non-empty table, unlike Delta which requires it
        at CREATE — the tradeoff is documented nulls for pre-existing
        rows; add it at version 1 to avoid them). Metadata rides
        manifests and checkpoints like constraints; a rewrite
        (compact/merge/delete) carries values verbatim and never
        re-allocates."""
        if int(step) == 0:
            raise ValueError("identity step must be nonzero")
        base = self.snapshot_meta()
        if base is None:
            raise FileNotFoundError(
                "add_identity_column needs a committed table (append "
                "an empty dataframe with the base schema first)"
            )
        schema = base.schema()
        if name in schema.fieldNames():
            raise ValueError(
                f"column {name!r} already exists; identity must own "
                f"a fresh column"
            )
        taken = {base.phys(c) for c in schema.fieldNames()} | set(
            base.retired_cols
        )
        if name in taken:
            raise SchemaEvolutionError(
                f"column name {name!r} collides with the physical "
                f"name of a dropped or renamed column"
            )
        if name in base.identity:
            raise ValueError(f"{name!r} is already an identity column")
        new_schema = StructType(
            list(schema.fields) + [StructField(name, LongType(), True)]
        )
        new_ident = dict(base.identity)
        new_ident[name] = {
            "start": int(start), "step": int(step), "high": None,
        }
        return self._commit(
            "schema",
            [],
            new_schema.json(),
            None,
            None,
            expected_base=base.version,
            identity=new_ident,
            op_params={
                "add_identity": {
                    "col": name, "start": int(start), "step": int(step),
                }
            },
        )

    def add_generated_column(
        self, name: str, expr: str, dtype: str
    ) -> int:
        """ALTER TABLE ADD COLUMN ``name dtype`` GENERATED ALWAYS AS
        (``expr``) — Delta's expression-generated columns, the
        partition-column analog for this stats-pruned layout: a column
        derived deterministically from the row (``date_trunc`` of a
        timestamp, a bucket hash, a parsed field), computed at WRITE
        time by every engine-owned path and carried in footer stats,
        so reads prune files on the DERIVED value without computing it
        (:meth:`snapshot_where` / :meth:`files_matching` on ``name``).

        Contract (Delta's, plus the add-after-creation relaxation this
        engine also makes for identity):

        * Writers that OMIT the column (``append`` / ``overwrite`` /
          ``replace_where`` / merge inserts) get it computed from
          ``expr`` automatically; writers that PROVIDE it must match —
          every commit validates staged files against the invariant
          ``NULL or exactly (expr)`` and fails loudly on a mismatch.
        * Rows in files written BEFORE the registration read NULL
          (documented backfill, like identity); rewrites carry them
          verbatim and never backfill.
        * UPDATE recomputes the column when a SET expr touches one of
          its referenced columns; SET-ing it directly is rejected.
        * Raw writers (the ``txnlake`` datasource) must provide the
          column physically — an append whose staged files lack it is
          rejected rather than silently null-filled.
        * The definition rides table properties (``generated.<col>``,
          API-managed), so checkpoints, RESTORE and CLONE carry it.

        ``expr`` must be deterministic, reference only existing
        non-generated columns, and stick to portable SQL (the txnlake
        writer validates commits session-less via DuckDB, like CHECK
        constraints)."""
        from pyspark.sql import functions as F

        base = self.snapshot_meta()
        if base is None:
            raise FileNotFoundError(
                "add_generated_column needs a committed table (append "
                "an empty dataframe with the base schema first)"
            )
        schema = base.schema()
        if name in schema.fieldNames():
            raise ValueError(
                f"column {name!r} already exists; a generated column "
                f"must own a fresh column"
            )
        if name == "_z":
            raise ValueError(
                "'_z' is reserved for the Morton clustering key"
            )
        if not name.isidentifier():
            # the invariant interpolates the bare name into SQL that
            # must parse in Spark AND the session-less DuckDB fallback
            # (whose quoting rules differ) — plain identifiers only
            raise ValueError(
                f"generated column name {name!r} must be a plain "
                f"identifier"
            )
        taken = {base.phys(c) for c in schema.fieldNames()} | set(
            base.retired_cols
        )
        if name in taken:
            raise SchemaEvolutionError(
                f"column name {name!r} collides with the physical "
                f"name of a dropped or renamed column"
            )
        gens = _generated_defs(base.props)
        chained = [g for g in gens if _expr_refs(expr, g)]
        if chained or _expr_refs(expr, name):
            raise ValueError(
                f"generation expression may not reference generated "
                f"columns ({chained or [name]}); inline their "
                f"expressions instead"
            )
        # dtype + expression validated up front: parse the type via a
        # DDL single-field schema, analyze expr against the table
        # schema, and reject nondeterministic expressions (the same
        # rule expr DML enforces — compute and validation would
        # otherwise disagree between jobs)
        field = self.spark.createDataFrame(
            [], f"`{name}` {dtype}"
        ).schema.fields[0]
        try:
            probe = self.spark.createDataFrame([], schema).select(
                F.expr(expr).cast(field.dataType).alias(name)
            )
        except Exception as err:
            raise ValueError(
                f"generation expression ({expr}) does not analyze "
                f"against the table schema: {err}"
            ) from None
        deterministic = True
        try:
            exprs = probe._jdf.queryExecution().analyzed().expressions()
            deterministic = all(
                exprs.apply(i).deterministic()
                for i in range(exprs.size())
            )
        except Exception:  # pragma: no cover - introspection moved
            pass  # best-effort, like _expr_dml_candidates
        if not deterministic:
            raise ValueError(
                f"nondeterministic generation expression ({expr}): "
                f"compute at write time and validation at commit time "
                f"would disagree"
            )
        new_schema = StructType(
            list(schema.fields) + [StructField(name, field.dataType, True)]
        )
        return self._commit(
            "schema",
            [],
            new_schema.json(),
            None,
            None,
            expected_base=base.version,
            props={_GEN_PREFIX + name: expr},
            op_params={
                "add_generated": {
                    "col": name, "expr": expr, "dtype": dtype,
                }
            },
        )

    def generated_columns(self) -> dict[str, str]:
        """{column -> generation SQL expr} currently registered, {}
        when none (or no commits yet)."""
        base = self.snapshot_meta()
        return _generated_defs(base.props) if base else {}

    def properties(self) -> dict[str, str]:
        """Current table properties (TBLPROPERTIES), {} for a table
        with none (or no commits yet)."""
        base = self.snapshot_meta()
        return dict(base.props) if base else {}

    def set_properties(self, props: dict[str, str]) -> int:
        """ALTER TABLE SET TBLPROPERTIES: publish ``props`` merged
        over the current set in one metadata-only commit. Values are
        stored as strings (JSON metadata); a None value is rejected —
        use :meth:`unset_properties` for removal. Concurrent setters
        of DISJOINT keys both land (the commit merges over the current
        base per attempt, like identity metadata); same-key races are
        last-writer-wins, Delta's semantics."""
        if not props:
            raise ValueError("set_properties needs >= 1 property")
        if any(v is None for v in props.values()):
            raise ValueError(
                "None value in set_properties; use unset_properties"
            )
        managed = [k for k in props if k.startswith(_GEN_PREFIX)]
        if managed:
            raise ValueError(
                f"{managed} are managed generated-column definitions; "
                f"use add_generated_column / drop_column"
            )
        base = self.snapshot_meta()
        if base is None:
            raise FileNotFoundError(
                f"no committed version at {self.root} — write the "
                f"table's first data before setting properties"
            )
        return self._commit(
            "props",
            [],
            base.schema_json,
            None,
            None,
            props={k: str(v) for k, v in props.items()},
            op_params={"set": sorted(props)},
        )

    def unset_properties(self, keys) -> int:
        """ALTER TABLE UNSET TBLPROPERTIES: remove ``keys`` (missing
        keys are ignored, like Delta's IF EXISTS form)."""
        keys = [keys] if isinstance(keys, str) else list(keys)
        if not keys:
            raise ValueError("unset_properties needs >= 1 key")
        managed = [k for k in keys if k.startswith(_GEN_PREFIX)]
        if managed:
            raise ValueError(
                f"{managed} are managed generated-column definitions; "
                f"drop_column removes them"
            )
        base = self.snapshot_meta()
        if base is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        if not set(keys) & set(base.props):
            return base.version  # nothing to remove: no-op
        return self._commit(
            "props",
            [],
            base.schema_json,
            None,
            None,
            props={k: None for k in keys},
            op_params={"unset": sorted(keys)},
        )

    def enable_cdf(self) -> int:
        """Enable the materialized CHANGE DATA FEED for this table
        (Delta's ``delta.enableChangeDataFeed``): from this commit on,
        every row-level DML (DELETE / UPDATE / MERGE, COW and MOR, and
        replace_where) also stages its change rows as parquet under
        ``_cdc/`` with ``_change_type`` attribution ('insert' |
        'delete' | 'update_preimage' | 'update_postimage'), referenced
        from the commit's manifest. Consumers (``changes_between``,
        the ``txnlake`` streaming source with ``readChangeFeed=true``)
        then read the changes directly — O(changed rows), no multiset
        diff — and UPDATEs carry pre/post attribution a file diff
        cannot reconstruct. Appends need no change files (their added
        files ARE the inserts); pure layout ops contribute nothing."""
        return self.set_properties({_CDF_PROP: "true"})

    def cdf_enabled(self, meta: Snapshot | None = None) -> bool:
        """Is the materialized change feed on (at ``meta``, default
        current)?"""
        if meta is None:
            meta = self.snapshot_meta()
        return bool(meta) and meta.props.get(_CDF_PROP) == "true"

    def add_constraint(
        self, name: str, expr: str, max_attempts: int = 5
    ) -> int:
        """ALTER TABLE ADD CONSTRAINT ``name`` CHECK (``expr``) —
        Delta's CHECK-constraint surface (NOT NULL is just
        ``"col IS NOT NULL"``). EVERY EXISTING ROW is validated first
        (one aggregate job over the snapshot), then the constraint
        commits as a metadata-only 'constraint' operation pinned to
        the validated version — a concurrent append (whose rows the
        scan never saw) forces re-validation and retry, so the
        invariant "all committed rows satisfy all committed
        constraints" holds without locks. From then on every commit's
        staged files are validated in :meth:`_commit` before publish.

        SQL CHECK semantics: FALSE violates, UNKNOWN passes. Re-adding
        an identical (name, expr) is an idempotent no-op; a different
        expr under an existing name raises ValueError (drop first)."""
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None:
                raise FileNotFoundError(
                    f"no committed version at {self.root} — append the "
                    f"table's first data (or schema) before constraining it"
                )
            if base.constraints.get(name) == expr:
                return base.version
            if name in base.constraints:
                raise ValueError(
                    f"constraint {name!r} already exists with a different "
                    f"expression; drop_constraint first"
                )
            if base.files:
                self._enforce_constraints(
                    list(base.files), base.schema_json, {name: expr},
                    base.column_map,
                )
            else:
                # empty table: still fail fast on an unanalyzable expr
                self.spark.createDataFrame([], base.schema()).where(expr)
            try:
                return self._commit(
                    "constraint",
                    [],
                    base.schema_json,
                    None,
                    None,
                    expected_base=base.version,
                    constraints={**base.constraints, name: expr},
                    op_params={"action": "add", "name": name, "expr": expr},
                )
            except ConcurrentWriteError:
                continue  # base moved: re-validate the new rows
        raise ConcurrentWriteError(
            f"gave up adding constraint {name!r} after {max_attempts} "
            f"contended attempts"
        )

    def drop_constraint(self, name: str, max_attempts: int = 5) -> int:
        """ALTER TABLE DROP CONSTRAINT — metadata-only. Unknown names
        no-op (idempotent). Pinned to the base version like add: the
        published set is recomputed from a fresh snapshot on every
        attempt, so a racing add_constraint of a DIFFERENT name is
        never silently erased by this drop's stale copy of the set."""
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None or name not in base.constraints:
                return self.latest_version()
            cons = {
                n: e for n, e in base.constraints.items() if n != name
            }
            try:
                return self._commit(
                    "constraint",
                    [],
                    base.schema_json,
                    None,
                    None,
                    expected_base=base.version,
                    constraints=cons,
                    op_params={"action": "drop", "name": name},
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"gave up dropping constraint {name!r} after {max_attempts} "
            f"contended attempts"
        )

    def rename_column(
        self, old: str, new: str, max_attempts: int = 5
    ) -> int:
        """ALTER TABLE RENAME COLUMN — metadata-only (Delta's column
        mapping): the LOGICAL name changes; the PHYSICAL parquet name
        stays what it always was, so no file is rewritten and every
        old file keeps reading correctly. Rejected while any CHECK
        constraint references the column (drop it first — renaming
        under it would silently break enforcement). Stats, bloom
        sidecars and deletion vectors are keyed by physical names and
        are unaffected. Pinned to the derived-from version; retries on
        contention."""
        import re

        if old == new:
            raise ValueError("rename to the same name")
        if new == "_z":
            raise ValueError(
                "'_z' is reserved for the Morton clustering key "
                "(optimize_zorder); pick another name"
            )
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None:
                raise FileNotFoundError(
                    f"no committed version at {self.root}"
                )
            schema = base.schema()
            names = schema.fieldNames()
            if old not in names:
                raise ValueError(f"column {old!r} does not exist")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            referenced = [
                n for n, e in base.constraints.items()
                if re.search(rf"\b{re.escape(old)}\b", e)
            ]
            if referenced:
                raise ValueError(
                    f"constraint(s) {referenced} reference {old!r}; "
                    f"drop them before renaming"
                )
            gens = _generated_defs(base.props)
            gen_refs = [
                g for g, e in gens.items()
                if g != old and _expr_refs(e, old)
            ]
            if gen_refs:
                raise ValueError(
                    f"generated column(s) {sorted(gen_refs)} derive "
                    f"from {old!r}; drop them before renaming"
                )
            gen_change = None
            if old in gens:
                # the definition follows the LOGICAL name, like the
                # identity spec: move the props key so writes keep
                # computing and validating under the new name
                gen_change = {
                    _GEN_PREFIX + old: None,
                    _GEN_PREFIX + new: gens[old],
                }
            phys = base.phys(old)
            new_fields = [
                StructField(new, f.dataType, f.nullable)
                if f.name == old
                else f
                for f in schema.fields
            ]
            cmap = {
                k: v for k, v in base.column_map.items() if k != old
            }
            if phys != new:
                cmap[new] = phys
            ident_change = None
            if old in base.identity:
                # identity follows the LOGICAL name: the allocator
                # writes by logical column, so the spec must move with
                # the rename or every later append would re-add the
                # old name and collide with its retired physical
                ident_change = {old: None, new: dict(base.identity[old])}
            zspec_change = None
            if old in base.zorder_spec.get("cols", ()):
                # the frozen z-spec is keyed by LOGICAL names too —
                # rename them in place so optimize_zorder keeps
                # accepting the (renamed) cluster set and the curve
                # stays interval-comparable
                zs = json.loads(json.dumps(base.zorder_spec))
                zs["cols"] = [new if c == old else c for c in zs["cols"]]
                for part in ("num", "cuts"):
                    if old in zs.get(part, {}):
                        zs[part][new] = zs[part].pop(old)
                zspec_change = zs
            try:
                return self._commit(
                    "schema",
                    [],
                    StructType(new_fields).json(),
                    None,
                    None,
                    expected_base=base.version,
                    column_map=cmap,
                    identity=ident_change,
                    zorder_spec=zspec_change,
                    props=gen_change,
                    op_params={
                        "action": "rename", "from": old, "to": new,
                    },
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"gave up renaming {old!r} after {max_attempts} attempts"
        )

    def drop_column(self, col: str, max_attempts: int = 5) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only: the column leaves
        the logical schema and its PHYSICAL name is RETIRED (old files
        still carry the bytes; readers never select them; a later
        append may not introduce a column whose physical name would
        collide — the data would resurrect). Rejected while a CHECK
        constraint references the column. Idempotent for unknown
        names."""
        import re

        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None:
                raise FileNotFoundError(
                    f"no committed version at {self.root}"
                )
            schema = base.schema()
            if col not in schema.fieldNames():
                return base.version
            if len(schema.fields) == 1:
                raise ValueError("cannot drop the only column")
            referenced = [
                n for n, e in base.constraints.items()
                if re.search(rf"\b{re.escape(col)}\b", e)
            ]
            if referenced:
                raise ValueError(
                    f"constraint(s) {referenced} reference {col!r}; "
                    f"drop them before dropping the column"
                )
            gens = _generated_defs(base.props)
            gen_refs = [
                g for g, e in gens.items()
                if g != col and _expr_refs(e, col)
            ]
            if gen_refs:
                raise ValueError(
                    f"generated column(s) {sorted(gen_refs)} derive "
                    f"from {col!r}; drop them before dropping the "
                    f"column"
                )
            phys = base.phys(col)
            new_fields = [f for f in schema.fields if f.name != col]
            cmap = {
                k: v for k, v in base.column_map.items() if k != col
            }
            try:
                return self._commit(
                    "schema",
                    [],
                    StructType(new_fields).json(),
                    None,
                    None,
                    expected_base=base.version,
                    column_map=cmap,
                    retired_cols=tuple(
                        dict.fromkeys(base.retired_cols + (phys,))
                    ),
                    # a dropped identity column stops being identity —
                    # without this removal every later append would
                    # try to allocate for it, re-add the column, and
                    # hit the resurrection guard forever
                    identity=(
                        {col: None} if col in base.identity else None
                    ),
                    # a curve referencing the dropped column is dead:
                    # clear it (the next optimize_zorder freezes a
                    # fresh spec and deliberately distrusts leftover
                    # _z stats — see fresh_spec there)
                    zorder_spec=(
                        {}
                        if col in base.zorder_spec.get("cols", ())
                        else None
                    ),
                    # a dropped generated column takes its definition
                    # with it (or later appends would try to compute a
                    # column the schema no longer has)
                    props=(
                        {_GEN_PREFIX + col: None} if col in gens else None
                    ),
                    op_params={"action": "drop", "column": col},
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"gave up dropping {col!r} after {max_attempts} attempts"
        )

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION — roll the CURRENT state back to
        ``version`` with a METADATA-ONLY commit (Delta's RESTORE): no
        data is copied, the commit just re-references that version's
        files and un-references everything newer. History is append-
        only — the rollback is itself a new version, every intermediate
        version stays time-travelable, and un-referenced files stay on
        disk for older readers until vacuum. Conversely a file the
        restore needs may already be VACUUMED away; that fails fast
        here with FileNotFoundError before anything commits.

        Concurrency: pinned to the caller-visible latest version —
        ANY concurrent commit aborts with ConcurrentWriteError (it is
        state this rollback would silently erase; re-read and decide
        again). Schema is restored exactly along with the file set.
        Writer transaction watermarks are NOT rolled back (a replayed
        (app_id, txn_seq) must still no-op after a restore, or
        exactly-once sinks would double-apply). Files the restore
        re-introduces are validated against the CURRENT constraint
        set — a constraint added after ``version`` still holds.
        Restoring to the current version is a no-op."""
        base = self.snapshot_meta()
        if base is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        if version == base.version:
            return base.version
        old = self.snapshot_meta(version)
        if old is None:
            raise FileNotFoundError(
                f"version {version} does not exist at {self.root}"
            )
        missing = [
            f for f in old.files if not (self.root / f).is_file()
        ] + [
            p for p in old.file_dvs.values()
            if not (self.root / p).is_file()
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore v{version}: {len(missing)} data/DV "
                f"file(s) already vacuumed, e.g. {missing[0]!r}"
            )
        # the CURRENT constraint set carries across the restore (like
        # rename/drop, data rollback does not waive invariants); one
        # referencing a column the target schema lacks would wedge
        # every later write with an analysis error — fail fast with
        # guidance instead, mirroring rename/drop's blocking rule
        for n, e in base.constraints.items():
            try:
                self.spark.createDataFrame([], old.schema()).where(e)
            except Exception:
                raise ValueError(
                    f"constraint {n!r} ({e!r}) references columns absent "
                    f"at version {version}; drop it before restoring"
                ) from None
        # generated-column definitions carry across like constraints
        # (restore rolls DATA back, not invariants); one whose column
        # or referenced columns the target schema lacks would wedge
        # every later append on the compute step — fail fast with the
        # same guidance
        old_names = set(old.schema().fieldNames())
        for g, e in _generated_defs(base.props).items():
            broken = g not in old_names
            if not broken:
                try:
                    self.spark.createDataFrame(
                        [], old.schema()
                    ).selectExpr(e)
                except Exception:
                    broken = True
            if broken:
                raise ValueError(
                    f"generated column {g!r} (= {e}) references columns "
                    f"absent at version {version}; drop_column({g!r}) "
                    f"before restoring"
                )
        base_set = set(base.files)
        replaced = tuple(sorted(base_set - set(old.files)))
        staged = sorted(set(old.files) - base_set)
        # deletion vectors roll back with the files: every old file
        # whose DV state differs from what the carry-forward would
        # produce gets an explicit set (or null = clear, for a vector
        # added after the target version on a still-live file)
        dv_updates: dict[str, str | None] = {}
        for f in old.files:
            want = old.file_dvs.get(f)
            have = base.file_dvs.get(f) if f in base_set else None
            if want != have:
                dv_updates[f] = want
        return self._commit(
            "restore",
            staged,
            old.schema_json,
            None,
            None,
            replaced=replaced,
            staged_stats={
                f: old.file_stats[f] for f in staged if f in old.file_stats
            },
            expected_base=base.version,
            dv_updates=dv_updates or None,
            # schema metadata rolls back with the data: the target
            # version's logical->physical map and retired set (a
            # column restored into the schema reclaims its physical)
            column_map=dict(old.column_map),
            retired_cols=old.retired_cols,
            op_params={"to_version": version},
        )

    def restore_to_timestamp(self, ts_ms: int) -> int:
        """RESTORE TABLE TO TIMESTAMP AS OF — roll back to the newest
        version committed at or before wall-clock ``ts_ms``
        (:meth:`version_as_of` composed with :meth:`restore`; same
        metadata-only commit, pinning, validation and fail-fast
        rules). Advisory commit stamps, like all timestamp travel."""
        return self.restore(self.version_as_of(ts_ms))

    def clone_to(
        self,
        target_path: str,
        shallow: bool = True,
        version: int | None = None,
    ) -> "TxnTable":
        """CREATE TABLE ... [SHALLOW] CLONE (Delta's clone): a new,
        INDEPENDENT table whose v1 references this table's snapshot.

        ``shallow=True`` (the zero-copy sandbox): the clone's manifest
        lists the source's data files by ABSOLUTE path — cloning a
        100 TB table writes one manifest plus rewritten deletion-
        vector sidecars (tiny JSON, re-keyed to the absolute entries),
        no data movement. Every read path, DML, and MERGE keys files
        by their manifest entry (:func:`_manifest_key_expr` keeps
        out-of-root paths verbatim), so the clone supports the full
        DML surface; any rewrite (compact / COW DML) migrates the
        touched entries into clone-local ``data/`` files. The clone's
        vacuum NEVER touches source files (they live outside its
        ``data/``); conversely **vacuuming the SOURCE can break
        shallow clones** — Delta's documented caveat, inherited.

        ``shallow=False`` copies the bytes into clone-local storage
        (a backup/fork with no source dependence).

        Carried: schema, file stats, deletion vectors, constraints,
        column mapping, retired columns, identity watermarks, z-order
        spec, table properties. NOT carried (Delta's rule): writer
        transaction watermarks (a stream replaying into the clone is
        a new consumer) and history (the clone starts at v1).
        Cite: reference has no table management at all
        (/root/reference/etl.py overwrites directories wholesale)."""
        src = self.snapshot_meta(version)
        if src is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        # fail fast on already-vacuumed bytes (RESTORE's rule): a clone
        # of an old version must not publish references to files that
        # are gone — the clone would be born unreadable
        gone = [
            f for f in src.files if not (self.root / f).is_file()
        ] + [
            p for p in src.file_dvs.values()
            if not (self.root / p).is_file()
        ]
        if gone:
            raise FileNotFoundError(
                f"cannot clone v{src.version}: {len(gone)} data/DV "
                f"file(s) already vacuumed, e.g. {gone[0]!r}"
            )
        target = TxnTable(
            self.spark,
            target_path,
            checkpoint_interval=self.checkpoint_interval,
        )
        mapping: dict[str, str] = {}
        if shallow:
            for f in src.files:
                mapping[f] = str((self.root / f).resolve())
        else:
            stage_rel = f"{_DATA_DIR}/{uuid.uuid4().hex}"
            (target.root / stage_rel).mkdir(parents=True, exist_ok=True)
            for i, f in enumerate(src.files):
                rel = f"{stage_rel}/{i:06d}-{Path(f).name}"
                shutil.copyfile(self.root / f, target.root / rel)
                mapping[f] = rel
        dvs: dict[str, str] = {}
        for f, dv_rel in src.file_dvs.items():
            doc = json.loads((self.root / dv_rel).read_text())
            new_rel = f"{_DV_DIR}/{uuid.uuid4().hex}.json"
            p = target.root / new_rel
            p.parent.mkdir(parents=True, exist_ok=True)
            tmp = p.parent / f".tmp-{uuid.uuid4().hex}"
            tmp.write_text(
                json.dumps(
                    {"file": mapping[f], "indices": doc["indices"]}
                )
            )
            os.replace(tmp, p)
            dvs[mapping[f]] = new_rel
        manifest = {
            "version": 1,
            # replays exactly like any overwrite: files = add, stats
            # from add_stats, vectors from dv
            "operation": "overwrite",
            "ts_ms": int(time.time() * 1000),
            "add": [mapping[f] for f in src.files],
            "remove": [],
            "schema": src.schema_json,
            "writer_txns": {},
            "add_stats": {
                mapping[f]: s for f, s in src.file_stats.items()
            },
            "params": {
                "clone": {
                    "source": str(self.root),
                    "source_version": src.version,
                    "shallow": bool(shallow),
                }
            },
            "constraints": dict(src.constraints),
            "dv": dvs,
            "column_map": dict(src.column_map),
            "retired_cols": list(src.retired_cols),
            "identity": dict(src.identity),
            "zorder_spec": dict(src.zorder_spec),
            "props": dict(src.props),
            "cdc": [],
        }
        if not target._publish(manifest, _manifest_path(target.root, 1)):
            raise ValueError(
                f"clone target {target_path!r} already has a committed "
                f"version"
            )
        return target

    def _build_dv_updates(
        self, base: Snapshot, matched
    ) -> tuple[dict[str, str], dict[str, str | None]]:
        """Union newly-deleted positions (``matched``: a DataFrame
        with ``__dv_file``/``__dv_pos``) into per-file deletion-vector
        documents → (dv_updates, expected_dvs) for :meth:`_commit`.
        Files whose union adds nothing are omitted; sidecars are
        written write-once under ``_dv/`` (orphans from a lost commit
        race stay invisible and are vacuumed)."""
        from pyspark.sql import functions as F

        per_file = matched.groupBy("__dv_file").agg(
            F.sort_array(F.collect_list("__dv_pos")).alias("idx")
        ).collect()
        updates: dict[str, str] = {}
        expected: dict[str, str | None] = {}
        for r in per_file:
            f, new_idx = r["__dv_file"], set(r["idx"])
            old_rel = base.file_dvs.get(f)
            old_idx: set[int] = set()
            if old_rel is not None:
                old_idx = set(
                    json.loads((self.root / old_rel).read_text())["indices"]
                )
            union = old_idx | new_idx
            if union == old_idx:
                continue  # nothing newly deleted in this file
            dv_rel = f"{_DV_DIR}/{uuid.uuid4().hex}.json"
            p = self.root / dv_rel
            p.parent.mkdir(parents=True, exist_ok=True)
            tmp = p.parent / f".tmp-{uuid.uuid4().hex}"
            tmp.write_text(
                json.dumps(
                    {"file": f, "indices": sorted(int(i) for i in union)}
                )
            )
            os.replace(tmp, p)
            updates[f] = dv_rel
            expected[f] = old_rel
        return updates, expected

    def delete_where_mor(
        self,
        col: str,
        lo,
        hi,
        app_id: str | None = None,
        txn_seq: int | None = None,
        max_dv_rows: int = 1_000_000,
    ) -> int:
        """Single-range form of :meth:`delete_where_mor_ranges`."""
        return self.delete_where_mor_ranges(
            col, [(lo, hi)], app_id=app_id, txn_seq=txn_seq,
            max_dv_rows=max_dv_rows,
        )

    def delete_where_mor_ranges(
        self,
        col: str,
        ranges,
        app_id: str | None = None,
        txn_seq: int | None = None,
        max_dv_rows: int = 1_000_000,
        max_attempts: int = 5,
    ) -> int:
        """MERGE-ON-READ row-level DELETE (deletion vectors — Delta's
        DV / Iceberg's position-delete design): instead of rewriting
        every file that contains a matching row, record the matching
        ROW POSITIONS in per-file sidecars under ``_dv/`` and commit
        the pointers. A delete of 100 rows scattered across 100
        near-gigabyte files writes ~100 tiny JSON documents instead of
        ~100 GB of parquet — the write amplification fix for small
        scattered deletes. Readers drop the positions via
        :meth:`read_files` (every read path routes through it);
        any REWRITE of the file (compact / OPTIMIZE / merge / COW
        delete or update) applies the vector physically and retires
        it, exactly like Delta's DV lifecycle.

        Sized for the intended workload: matched positions are
        collected to the committer, bounded by ``max_dv_rows`` —
        beyond that the rewrite amortizes and :meth:`delete_where` is
        the right tool (the same guidance Delta gives). Vectors are
        write-once documents; a re-delete unions against the current
        vector and commits a NEW document, with _commit's
        expected-DV check turning a concurrent union-union race into
        ConcurrentWriteError + retry instead of lost deletes.
        Exactly-once under ``(app_id, txn_seq)`` replay like every
        commit. Deletes matching nothing new commit nothing."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        ranges = [tuple(r) for r in ranges]
        if not ranges:
            raise ValueError("delete_where_mor_ranges needs >= 1 range")
        pred = reduce(
            or_, [F.col(col).between(lo, hi) for lo, hi in ranges]
        )
        return self._mor_delete_core(
            lambda base: (
                pred, self.files_matching_any(col, ranges, base.version)
            ),
            app_id, txn_seq, max_dv_rows, max_attempts,
            op_params={"col": col, "ranges": ranges, "mor": True},
            cow_hint="delete_where",
        )

    def delete_where_expr_mor(
        self,
        predicate: str,
        prune_hints: dict | None = None,
        app_id: str | None = None,
        txn_seq: int | None = None,
        max_dv_rows: int = 1_000_000,
        max_attempts: int = 5,
    ) -> int:
        """MERGE-ON-READ DELETE with an ARBITRARY SQL predicate — the
        expr x MOR corner of the DML matrix: matching row positions go
        into deletion-vector sidecars instead of rewriting files, so a
        scattered predicate delete over 100 near-GB files writes ~100
        tiny documents. Planning (validation, determinism rejection,
        prune hints) is :meth:`delete_where_expr`'s; vector mechanics,
        ``max_dv_rows`` bound, union idempotence, concurrency CAS and
        replay are :meth:`delete_where_mor_ranges`'s. The predicate
        evaluates ONCE per attempt (a single persisted job marks
        positions), so the two-pass skew the COW form guards against
        cannot occur — but nondeterministic predicates are still
        rejected for replay sanity."""
        return self._mor_delete_core(
            lambda base: self._expr_dml_candidates(
                base, predicate, prune_hints
            ),
            app_id, txn_seq, max_dv_rows, max_attempts,
            op_params={
                "predicate": predicate,
                "mor": True,
                "hints": {
                    c: [list(r) for r in rs]
                    for c, rs in (prune_hints or {}).items()
                },
            },
            cow_hint="delete_where_expr",
        )

    def _mor_delete_core(
        self,
        plan,
        app_id: str | None,
        txn_seq: int | None,
        max_dv_rows: int,
        max_attempts: int,
        op_params: dict,
        cow_hint: str,
    ) -> int:
        """Shared merge-on-read DELETE loop: ``plan(base) -> (pred,
        candidate_files)`` supplies the predicate and the stats-pruned
        candidates; everything else (raw-position scan, bound, vector
        union, CAS + retry) is identical across the range and expr
        forms."""
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None or not base.files:
                return self.latest_version()
            pred, affected = plan(base)
            if not affected:
                return base.version
            # RAW positions (no DV applied): the union below absorbs
            # already-deleted positions idempotently. Persisted: the
            # bound count and the per-file vector build would
            # otherwise each rescan every candidate file.
            matched = (
                self._read_with_positions(
                    base, list(affected), base.schema(), apply_dvs=False
                )
                .where(pred)
                .select("__dv_file", "__dv_pos")
                .persist()
            )
            try:
                n = matched.count()
                if n > max_dv_rows:
                    raise ValueError(
                        f"{n} matching rows exceed max_dv_rows="
                        f"{max_dv_rows}; use {cow_hint} (copy-on-write) "
                        f"for bulk deletes"
                    )
                updates, expected = self._build_dv_updates(base, matched)
            finally:
                matched.unpersist()
            if not updates:
                return base.version
            cdc = None
            if base.props.get(_CDF_PROP) == "true":
                # change rows = the VISIBLE matches (DV-applied read):
                # positions already deleted are masked, so this is
                # exactly the newly-deleted set the vectors record
                cdc = self._stage_cdc(
                    [
                        (
                            self.read_files(base, list(affected))
                            .where(pred),
                            "delete",
                        )
                    ],
                    base.schema(),
                    base.column_map,
                )
            try:
                return self._commit(
                    "delete",
                    [],
                    base.schema_json,
                    app_id,
                    txn_seq,
                    dv_updates=updates,
                    expected_dvs=expected,
                    op_params=op_params,
                    cdc=cdc,
                )
            except ConcurrentWriteError:
                continue  # recompute against the moved state;
                # orphaned DV docs are invisible and vacuumed
        raise ConcurrentWriteError(
            f"gave up merge-on-read delete after {max_attempts} "
            f"contended attempts"
        )

    def update_where_mor(
        self,
        col: str,
        lo,
        hi,
        set_exprs: dict[str, str],
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
        max_dv_rows: int = 1_000_000,
        max_attempts: int = 5,
    ) -> int:
        """Single-range form of :meth:`update_where_mor_ranges`."""
        return self.update_where_mor_ranges(
            col, [(lo, hi)], set_exprs, stats_cols=stats_cols,
            app_id=app_id, txn_seq=txn_seq, max_dv_rows=max_dv_rows,
            max_attempts=max_attempts,
        )

    def update_where_mor_ranges(
        self,
        col: str,
        ranges,
        set_exprs: dict[str, str],
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
        max_dv_rows: int = 1_000_000,
        max_attempts: int = 5,
    ) -> int:
        """MERGE-ON-READ row-level UPDATE of rows with ``col`` in ANY
        of the [lo, hi] ``ranges`` (round-4 verdict #8 — symmetry with
        :meth:`update_where_ranges` and
        :meth:`delete_where_mor_ranges`): deletion-vector the matched
        positions and APPEND the transformed rows in the same atomic
        commit — write cost O(matched rows), not O(files containing
        them) (the position-delete + re-insert shape Iceberg's MOR
        updates use). A scattered multi-range update touches only the
        intersecting files' sidecars; untouched files keep their
        bytes AND their stats. Matched rows are read WITH the current
        vectors applied, so an already-deleted row is never
        resurrected as an updated copy. Same validation, bounds,
        concurrency and replay rules as
        :meth:`delete_where_mor_ranges` / :meth:`update_where`; any
        later rewrite of the files applies the vectors physically and
        retires them."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        ranges = [tuple(r) for r in ranges]
        if not ranges:
            raise ValueError("update_where_mor_ranges needs >= 1 range")
        pred = reduce(
            or_, [F.col(col).between(lo, hi) for lo, hi in ranges]
        ) & F.col(col).isNotNull()
        return self._mor_update_core(
            lambda base: (
                pred, self.files_matching_any(col, ranges, base.version)
            ),
            set_exprs, stats_cols, app_id, txn_seq, max_dv_rows,
            max_attempts,
            op_params={
                "col": col,
                "ranges": ranges,
                "set": sorted(set_exprs),
                "mor": True,
            },
            cow_hint="update_where",
        )

    def update_where_expr_mor(
        self,
        predicate: str,
        set_exprs: dict[str, str],
        prune_hints: dict | None = None,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
        max_dv_rows: int = 1_000_000,
        max_attempts: int = 5,
    ) -> int:
        """MERGE-ON-READ UPDATE with an ARBITRARY SQL predicate:
        vector the matched positions and append the transformed rows
        in one atomic commit — write cost O(matched rows). Planning is
        :meth:`update_where_expr`'s (validation, identity guard,
        determinism rejection, prune hints); vector mechanics, bounds
        and concurrency are :meth:`update_where_mor_ranges`'s. Matched
        rows read WITH current vectors applied, so an already-deleted
        row never resurrects as an updated copy."""
        return self._mor_update_core(
            lambda base: self._expr_dml_candidates(
                base, predicate, prune_hints
            ),
            set_exprs, stats_cols, app_id, txn_seq, max_dv_rows,
            max_attempts,
            op_params={
                "predicate": predicate,
                "set": sorted(set_exprs),
                "mor": True,
                "hints": {
                    c: [list(r) for r in rs]
                    for c, rs in (prune_hints or {}).items()
                },
            },
            cow_hint="update_where_expr",
        )

    def _mor_update_core(
        self,
        plan,
        set_exprs: dict[str, str],
        stats_cols: tuple[str, ...],
        app_id: str | None,
        txn_seq: int | None,
        max_dv_rows: int,
        max_attempts: int,
        op_params: dict,
        cow_hint: str,
    ) -> int:
        """Shared merge-on-read UPDATE loop (see
        :meth:`_mor_delete_core` for the plan contract): validates SET
        exprs against each attempt's schema (identity columns
        rejected), vectors the matched positions, appends the
        transformed rows, commits both atomically."""
        from pyspark.sql import functions as F

        if not set_exprs:
            raise ValueError(f"{cow_hint}_mor needs >= 1 SET expr")
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None or not base.files:
                return self.latest_version()
            schema = base.schema()
            bad = set(set_exprs) - set(schema.fieldNames())
            if bad:
                raise ValueError(
                    f"SET exprs for unknown columns {sorted(bad)}"
                )
            id_set = set(set_exprs) & set(base.identity)
            if id_set:
                raise ValueError(
                    f"identity columns {sorted(id_set)} are GENERATED "
                    f"ALWAYS and cannot be SET"
                )
            gens = self._reject_generated_sets(base, set_exprs)
            pred, affected = plan(base)
            if not affected:
                return base.version
            # persist BEFORE counting: the count materializes the
            # cache, so the DV build and the staged rewrite reuse it
            # instead of rescanning every affected file
            matched = (
                self._read_with_positions(base, list(affected), schema)
                .where(pred)
                .persist()
            )
            n = matched.count()
            if n == 0:
                matched.unpersist()
                return base.version
            if n > max_dv_rows:
                matched.unpersist()
                raise ValueError(
                    f"{n} matching rows exceed max_dv_rows="
                    f"{max_dv_rows}; use {cow_hint} (copy-on-write) "
                    f"for bulk updates"
                )
            try:
                # every matched row transforms (pre-filtered), so the
                # hit column is a constant TRUE; generated columns
                # recompute on the post-SET row like the COW forms
                updated = self._update_transform(
                    matched, F.lit(True), set_exprs, schema, gens
                )
                staged, _sj, stats = self._stage(updated, stats_cols)
                updates, expected = self._build_dv_updates(
                    base, matched.select("__dv_file", "__dv_pos")
                )
                cdc = None
                if base.props.get(_CDF_PROP) == "true":
                    # matched is persisted and DV-applied: it IS the
                    # preimage; the postimage is the appended rewrite
                    pre = matched.select(
                        *[F.col(f.name) for f in schema.fields]
                    )
                    cdc = self._stage_cdc(
                        [
                            (pre, "update_preimage"),
                            (updated, "update_postimage"),
                        ],
                        schema,
                        base.column_map,
                    )
            finally:
                matched.unpersist()
            if not updates and not staged:
                return base.version
            try:
                return self._commit(
                    "update",
                    staged,
                    schema.json(),  # SET exprs cast back: invariant
                    app_id,
                    txn_seq,
                    staged_stats=stats,
                    dv_updates=updates,
                    expected_dvs=expected,
                    op_params=op_params,
                    cdc=cdc,
                )
            except ConcurrentWriteError:
                continue  # recompute; orphan stage/DV docs are vacuumed
        raise ConcurrentWriteError(
            f"gave up merge-on-read update after {max_attempts} "
            f"contended attempts"
        )

    def purge_vectors(
        self,
        min_deleted_ratio: float = 0.0,
        stats_cols: tuple[str, ...] = (),
    ) -> int:
        """REORG-style maintenance (Delta's ``REORG TABLE ... APPLY
        (PURGE)``): physically rewrite ONLY the files whose deletion
        vector marks at least ``min_deleted_ratio`` of their rows,
        retiring those vectors — bounds the read-time anti-join debt
        merge-on-read accumulates without paying a full compaction.
        Ratios come from the vector sizes and the parquet footers'
        row counts (local metadata reads, no data scan). Returns the
        committed version (current one when nothing qualifies)."""
        import pyarrow.parquet as pq

        base = self.snapshot_meta()
        if base is None or not base.file_dvs:
            return self.latest_version()
        todo = []
        for f, dv_rel in sorted(base.file_dvs.items()):
            n_deleted = len(
                json.loads((self.root / dv_rel).read_text())["indices"]
            )
            rows = pq.read_metadata(self.root / f).num_rows
            if rows and n_deleted / rows >= min_deleted_ratio:
                todo.append(f)
        if not todo:
            return base.version
        df = self.read_files(base, todo)  # vectors applied
        staged, _sj, stats = self._stage(df, stats_cols)
        return self._commit(
            "compact",
            staged,
            base.schema_json,  # maintenance never narrows schema
            None,
            None,
            replaced=tuple(todo),
            expected_dvs={f: base.file_dvs.get(f) for f in todo},
            staged_stats=stats,
            op_params={
                "purge_vectors": True,
                "min_deleted_ratio": min_deleted_ratio,
            },
        )

    def compact(
        self, target_files: int = 1, stats_cols: tuple[str, ...] = ()
    ) -> int:
        """Rewrite the current snapshot into ``target_files`` files and
        commit the swap. Readers are never disturbed (old files stay on
        disk until vacuum); concurrent APPENDS are preserved by the
        rebase (only the files actually rewritten are dropped from the
        snapshot); a concurrent rewrite of the same files aborts."""
        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        df = self.snapshot(base.version).coalesce(target_files)
        staged, schema_json, stats = self._stage(df, stats_cols)
        return self._commit(
            "compact",
            staged,
            schema_json,
            None,
            None,
            replaced=base.files,
            expected_dvs={f: base.file_dvs.get(f) for f in base.files},
            staged_stats=stats,
        )

    def optimize_zorder(
        self,
        cluster_cols: tuple[str, ...],
        bits: int = 8,
        stats_cols: tuple[str, ...] = (),
        files_per_component: int | None = None,
        max_sample: int = 4096,
        refreeze: bool = False,
    ) -> int:
        """Incremental, MOR-aware OPTIMIZE ZORDER (round-4 verdict
        #7): recluster ONLY the file runs whose Morton-key ranges
        overlap, instead of rewriting the table.

        Mechanics that make "incremental" sound:

        * The bucketing parameters (numeric bounds, string cut
          points) are FROZEN as table metadata (``zorder_spec``) on
          the first call, so ``_z`` values from different commits are
          comparable — without that, every write's data-driven
          buckets would define a different curve and per-file
          z-ranges could not be interval-compared. Data drifting
          outside the frozen bounds clamps into edge buckets
          (granularity degrades at the edges; ``refreeze=True``
          recomputes the spec from current data and reclusters the
          whole table under it — the periodic re-tightening move,
          also the way to change the cluster column set).
        * Rewrites stage ``_z`` as a PHYSICAL parquet column whose
          footer stats ride the manifest like any stats column, but
          the committed schema never includes it — readers project it
          away, and every future optimize can interval-compare files
          without reading data. (~8 bytes/row of storage, the price
          of O(changed files) maintenance.)
        * Selection = connected components of the z-interval overlap
          graph over [z_min, z_max] per file. Files never clustered
          under the spec get their z-range computed by ONE bounded
          scan of just those files (per-file min/max of the key).
          A component is rewritten when it has >= 2 files, contains
          an unclustered file, or contains a file with a DELETION
          VECTOR — the rewrite reads through :meth:`read_files` (DVs
          applied physically) and the commit retires the vectors, so
          clustering maintenance also pays down merge-on-read debt.
          Clean singleton files are untouched — a second call right
          after a first is a NO-OP (idempotent).

        Commits as a ``compact`` (same conflict rules: concurrent
        appends rebase, concurrent rewrites of the inputs abort).
        ``files_per_component`` bounds each component's output width
        (default: as many files as it had)."""
        from pyspark.sql import functions as F

        from etl_data_lake_spark.sources.sinks import (
            compute_zorder_spec,
            zorder_key_with_spec,
        )

        cluster_cols = tuple(cluster_cols)
        if not cluster_cols:
            raise ValueError("optimize_zorder needs >= 1 cluster column")
        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        schema = base.schema()
        missing = set(cluster_cols) - set(schema.fieldNames())
        if missing:
            raise ValueError(f"unknown cluster columns {sorted(missing)}")
        if "_z" in schema.fieldNames() or "_z" in {
            base.phys(c) for c in schema.fieldNames()
        }:
            raise ValueError(
                "table already has a column named '_z'; optimize_zorder "
                "reserves that physical name for the Morton key"
            )
        observed_spec = dict(base.zorder_spec)
        spec = {} if refreeze else dict(base.zorder_spec)
        if spec and list(spec.get("cols", ())) != list(cluster_cols):
            raise ValueError(
                f"table is z-ordered on {spec.get('cols')}; pass the "
                f"same columns, or refreeze=True to re-tighten the "
                f"curve (full recluster) on a new column set"
            )
        fresh_spec = not spec
        if fresh_spec:
            spec = compute_zorder_spec(
                self.snapshot(base.version), cluster_cols, bits, max_sample
            )

        # per-file z-intervals: clustered files from manifest stats,
        # unclustered ones from one bounded scan of exactly those
        # files. Under a FRESH spec any leftover _z entries (a past
        # curve cleared by drop_column) were computed under different
        # buckets and are NOT interval-comparable — every file is
        # unclustered then.
        zranges: dict[str, tuple[int, int]] = {}
        unclustered: list[str] = []
        for f in base.files:
            st = (
                None if fresh_spec
                else base.file_stats.get(f, {}).get("_z")
            )
            if st is not None and st[0] is not None:
                zranges[f] = (int(st[0]), int(st[1]))
            else:
                unclustered.append(f)
        if unclustered:
            keyed = zorder_key_with_spec(
                self._read_with_positions(
                    base, unclustered, schema, apply_dvs=False
                ),
                spec,
            )
            for r in (
                keyed.groupBy("__dv_file")
                .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
                .collect()
            ):  # bounded by the unclustered FILE count
                zranges[r["__dv_file"]] = (int(r["lo"]), int(r["hi"]))
        must = set(unclustered) | {
            f for f in base.files if f in base.file_dvs
        }

        # connected components of the interval-overlap graph via one
        # sweep over files sorted by z_min
        comps: list[list[str]] = []
        cur: list[str] = []
        cur_hi: int | None = None
        for f in sorted(zranges, key=lambda f: zranges[f][0]):
            lo, hi = zranges[f]
            if cur and cur_hi is not None and lo <= cur_hi:
                cur.append(f)
                cur_hi = max(cur_hi, hi)
            else:
                if cur:
                    comps.append(cur)
                cur, cur_hi = [f], hi
        if cur:
            comps.append(cur)

        selected = [
            comp
            for comp in comps
            if len(comp) > 1 or any(f in must for f in comp)
        ]
        if not selected:
            return base.version
        eff_stats = tuple(
            dict.fromkeys(tuple(cluster_cols) + tuple(stats_cols) + ("_z",))
        )
        all_staged: list[str] = []
        all_stats: dict = {}
        replaced: list[str] = []
        for comp in selected:
            width = files_per_component or max(len(comp), 1)
            clustered = (
                zorder_key_with_spec(
                    self.read_files(base, comp), spec
                )
                .repartitionByRange(width, F.col("_z"))
                .sortWithinPartitions("_z")
            )
            staged, _sj, stats = self._stage(clustered, eff_stats)
            all_staged.extend(staged)
            all_stats.update(stats)
            replaced.extend(comp)
        return self._commit(
            "compact",
            all_staged,
            schema.json(),  # _z stays physical-only, never in schema
            None,
            None,
            replaced=tuple(replaced),
            expected_dvs={f: base.file_dvs.get(f) for f in replaced},
            staged_stats=all_stats,
            zorder_spec=spec,
            expected_zorder_spec=observed_spec,
            op_params={
                "zorder": list(cluster_cols),
                "components": len(selected),
            },
        )

    def analyze_stats(
        self,
        cols: tuple[str, ...],
        max_attempts: int = 5,
    ) -> int:
        """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS — backfill
        manifest stats for files that lack them on any of ``cols``
        (appends made without ``stats_cols``, pre-feature files), so
        range/null/prefix pruning, DML file skipping, and
        optimize_zorder's interval logic work retroactively. Reads
        ONLY parquet FOOTERS of exactly the files missing an entry —
        one metadata GET per file, no data scan, no Spark job — and
        publishes a metadata-only ``stats`` commit (file set, schema,
        everything else unchanged; replayed like constraint commits;
        the streaming source skips it). Existing per-file entries for
        OTHER columns are preserved (entries merge, not replace).
        No-op when nothing is missing."""
        cols = tuple(cols)
        if not cols:
            raise ValueError("analyze_stats needs >= 1 column")
        for _ in range(max_attempts):
            base = self.snapshot_meta()
            if base is None or not base.files:
                return self.latest_version()
            known = set(base.schema().fieldNames())
            bad = set(cols) - known
            if bad:
                raise ValueError(f"unknown columns {sorted(bad)}")
            phys = tuple(base.phys(c) for c in cols)
            todo = [
                f
                for f in base.files
                if any(
                    p not in base.file_stats.get(f, {}) for p in phys
                )
            ]
            if not todo:
                return base.version
            computed = footer_stats(self.root, todo, phys)
            # only files whose footers actually yielded a NEW column
            # entry commit — a file whose footer cannot answer (column
            # younger than the file, stats disabled at write) stays
            # out, so repeated ANALYZE calls converge to a no-op
            # instead of growing the log forever
            merged = {
                f: {**base.file_stats.get(f, {}), **computed[f]}
                for f in todo
                if computed.get(f)
                and set(computed[f]) - set(base.file_stats.get(f, {}))
            }
            if not merged:
                return base.version
            try:
                return self._commit(
                    "stats",
                    [],
                    base.schema_json,
                    None,
                    None,
                    expected_base=base.version,
                    staged_stats=merged,
                    op_params={"analyze": list(cols)},
                )
            except ConcurrentWriteError:
                continue  # files may have moved; recompute the todo set
        raise ConcurrentWriteError(
            f"gave up analyze_stats after {max_attempts} contended "
            f"attempts"
        )

    def append_clustered(
        self,
        df: DataFrame,
        stats_cols: tuple[str, ...] = (),
        app_id: str | None = None,
        txn_seq: int | None = None,
        n_files: int = 8,
    ) -> int:
        """Append ``df`` ON the table's frozen Z-order curve (requires
        one prior :meth:`optimize_zorder`): the batch is Morton-keyed
        under the SAME ``zorder_spec``, range-partitioned and sorted by
        ``_z``, and staged WITH ``_z`` footer stats — so the new files
        land as already-clustered citizens of the curve and the next
        optimize_zorder merges only genuine overlaps instead of
        re-ranging them from scratch. The committed schema never
        includes ``_z`` (physical-only, like the optimizer's rewrites).
        Identity tables reject this path (allocation lives in
        :meth:`append`); everything else matches ``append``."""
        from pyspark.sql import functions as F

        from etl_data_lake_spark.sources.sinks import zorder_key_with_spec

        base = self.snapshot_meta()
        if base is None or not base.zorder_spec:
            raise ValueError(
                "append_clustered needs a frozen zorder_spec; run "
                "optimize_zorder(cluster_cols) once first"
            )
        if base.identity:
            raise ValueError(
                "append_clustered does not allocate identity columns; "
                "use TxnTable.append"
            )
        spec = base.zorder_spec
        missing = set(spec["cols"]) - set(df.columns)
        if missing:
            raise ValueError(
                f"dataframe lacks cluster columns {sorted(missing)}"
            )
        schema_json = df.schema.json()  # WITHOUT _z: append-evolution
        clustered = (
            zorder_key_with_spec(df, spec)
            .repartitionByRange(n_files, F.col("_z"))
            .sortWithinPartitions("_z")
        )
        eff_stats = tuple(
            dict.fromkeys(
                tuple(spec["cols"]) + tuple(stats_cols) + ("_z",)
            )
        )
        staged, _sj, stats = self._stage(clustered, eff_stats)
        return self._commit(
            "append", staged, schema_json, app_id, txn_seq,
            staged_stats=stats,
            expected_zorder_spec=spec,
        )

    # -------------------------------------------------- maintenance --

    def optimize_small_files(
        self,
        target_bytes: int = 128 << 20,
        min_files: int = 2,
        stats_cols: tuple[str, ...] = (),
    ) -> int:
        """OPTIMIZE: coalesce the snapshot's SMALL files (< ``target_
        bytes``) into ~target-sized ones and commit the swap; files
        already at target size are left alone — unlike :meth:`compact`,
        which rewrites everything. This is the small-file maintenance a
        streaming or merge-heavy table needs: micro-batch appends and
        touched-file merges each add a few small files, and at 100 TB
        an unmaintained table degenerates into millions of them (footer
        reads and task scheduling dominate the scan). Rewriting ONLY
        the small tail keeps the maintenance cost proportional to the
        recent write activity, not the table.

        Concurrency inherits compaction's rule: concurrent appends
        rebase cleanly (their files aren't among the replaced); a
        concurrent rewrite of the same files aborts. Sizes come from
        one stat per file on the committer — no data read for the
        decision, only for the rewrite. Returns the committed (or
        current, when fewer than ``min_files`` qualify) version."""
        import math

        base = self.snapshot_meta()
        if base is None or not base.files:
            return self.latest_version()
        sizes = {f: (self.root / f).stat().st_size for f in base.files}
        small = [f for f in base.files if sizes[f] < target_bytes]
        if len(small) < max(min_files, 2):
            return base.version
        total = sum(sizes[f] for f in small)
        n_out = max(1, math.ceil(total / target_bytes))
        df = self.read_files(base, small).coalesce(n_out)
        staged, schema_json, stats = self._stage(df, stats_cols)
        return self._commit(
            "compact",
            staged,
            base.schema().json(),  # maintenance never narrows schema
            None,
            None,
            replaced=tuple(small),
            expected_dvs={f: base.file_dvs.get(f) for f in small},
            staged_stats=stats,
        )

    def vacuum_older_than(self, retention_ms: int, now_ms: int | None = None) -> int:
        """Time-based VACUUM (the production gate Delta uses): keep
        every snapshot a reader pinned within the last ``retention_ms``
        could still be reading — i.e. all versions committed inside
        the retention window plus the newest one at-or-before its
        start (what a reader who resolved 'latest' just before the
        window opened sees). Composes :meth:`version_as_of` with
        :meth:`vacuum`; returns dirs removed. Must outlast the
        longest-running reader, like any vacuum."""
        if now_ms is None:
            now_ms = int(time.time() * 1000)
        try:
            horizon = self.version_as_of(now_ms - retention_ms)
        except FileNotFoundError:
            # every commit is inside the window: nothing to reclaim
            # beyond crash orphans, which version-1 retention handles
            horizon = max(1, self.latest_version())
        return self.vacuum(self.latest_version() - horizon + 1)

    def vacuum(self, keep_versions: int = 1, dry_run: bool = False) -> int:
        """Delete data dirs unreferenced by the ``keep_versions`` most
        recent snapshots (orphans from crashed stages included).
        Returns the number of dirs removed. Like Delta's VACUUM this
        breaks time travel beyond the horizon and must outlast the
        longest-running reader; time-based gating is
        :meth:`vacuum_older_than`. ``dry_run=True`` (Delta's ``VACUUM
        ... DRY RUN``) only counts what a real run would reclaim —
        nothing is deleted."""
        latest = self.latest_version()
        keep = set()
        keep_dvs = set()
        keep_cdc = set()
        for v in range(max(1, latest - keep_versions + 1), latest + 1):
            meta = self.snapshot_meta(v)
            # only staged files live under data/<dir>/; converted
            # in-place entries (bare names) and shallow-clone
            # references (absolute paths) are never under it, so they
            # can't be — and must not be — vacuum candidates
            keep.update(
                parts[1]
                for f in meta.files
                if len(parts := f.split("/")) >= 2 and parts[0] == _DATA_DIR
            )
            keep_dvs.update(meta.file_dvs.values())
            # change-data files are per-VERSION artifacts (manifest-
            # referenced, never snapshot state): keep the retained
            # versions' dirs so their change feed stays readable —
            # CDF beyond the vacuum horizon breaks with time travel
            keep_cdc.update(
                p.split("/")[1]
                for p in self._read_manifest(v).get("cdc", ())
            )
        data = self.root / _DATA_DIR
        removed = 0
        if data.is_dir():
            for d in data.iterdir():
                if d.is_dir() and d.name not in keep:
                    if not dry_run:
                        shutil.rmtree(d)
                    removed += 1
        # deletion-vector sidecars: drop documents no retained version
        # references (superseded unions, crash orphans)
        dv_dir = self.root / _DV_DIR
        if dv_dir.is_dir():
            for p in dv_dir.iterdir():
                if p.is_file() and f"{_DV_DIR}/{p.name}" not in keep_dvs:
                    if not dry_run:
                        p.unlink()
                    removed += 1
        cdc_dir = self.root / _CDC_DIR
        if cdc_dir.is_dir():
            for d in cdc_dir.iterdir():
                if d.is_dir() and d.name not in keep_cdc:
                    if not dry_run:
                        shutil.rmtree(d)
                    removed += 1
        return removed


def convert_parquet_dir(
    spark: SparkSession,
    path: str,
    stats_cols: tuple[str, ...] = (),
    checkpoint_interval: int = 10,
) -> TxnTable:
    """CONVERT TO txn table IN PLACE (Delta's ``CONVERT TO DELTA``):
    adopt an existing directory of parquet files as a transactional
    table WITHOUT copying data — the onboarding path for a 100 TB
    corpus that already lives as raw parquet. One manifest is
    published whose entries are the files' root-relative paths;
    footer stats for ``stats_cols`` come from the parquet metadata
    (one footer read per file, no data scan), so pruning works from
    commit one. Appends, DML, MERGE, compaction, CDF and the
    ``txnlake`` source all work immediately; rewrites migrate touched
    entries into managed ``data/`` files.

    Bounds and caveats (documented, not silent):

    * Hive-partitioned layouts (``key=value`` directories) are
      REJECTED — their partition values live in paths, not files, and
      would silently read as null. Materialize the column first.
    * Zero-row files are skipped (no footer stats — same rule as
      ``_stage``).
    * The adopted original files are outside ``data/`` and therefore
      never vacuum-reclaimed; after rewrites supersede them,
      ``compact()`` + manual cleanup of the originals retires them.
    * Schema = pyarrow ``unify_schemas`` over the footers: widening
      unions are fine, incompatible types fail loudly up front.
    """
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    root = Path(path)
    if (root / _LOG_DIR).exists():
        raise ValueError(f"{path!r} already has a transaction log")
    rels = []
    for p in sorted(root.rglob("*.parquet")):
        rel = p.relative_to(root).as_posix()
        if rel.startswith(("_", ".")) or "/_" in rel or "/." in rel:
            continue  # metadata/hidden trees are not data
        if "=" in rel:
            raise ValueError(
                f"hive-partitioned layout detected ({rel!r}): partition "
                f"values live in directory names, not the files, and "
                f"would read as null — materialize the partition "
                f"column into the data before converting"
            )
        if pq.read_metadata(p).num_rows > 0:
            rels.append(rel)
    if not rels:
        raise FileNotFoundError(f"no non-empty parquet files under {path!r}")
    import pyarrow as pa

    schema = from_arrow_schema(
        pa.unify_schemas(
            [pq.read_schema(root / r) for r in rels],
            promote_options="permissive",
        )
    )
    table = TxnTable(spark, path, checkpoint_interval=checkpoint_interval)
    manifest = {
        "version": 1,
        "operation": "overwrite",
        "ts_ms": int(time.time() * 1000),
        "add": rels,
        "remove": [],
        "schema": schema.json(),
        "writer_txns": {},
        "add_stats": footer_stats(root, rels, stats_cols),
        "params": {"convert": {"n_files": len(rels)}},
        "constraints": {},
        "dv": {},
        "column_map": {},
        "retired_cols": [],
        "identity": {},
        "zorder_spec": {},
        "props": {},
        "cdc": [],
    }
    if not table._publish(manifest, _manifest_path(root, 1)):
        raise ValueError(f"{path!r} gained a transaction log concurrently")
    return table


def txn_append_sink(path: str, app_id: str = "stream"):
    """``foreachBatch`` function giving a stream an exactly-once,
    atomically-published append sink: the batch id is the transaction
    seq, so a replayed micro-batch (restart, retry) commits nothing
    the second time. Contrast streaming/upsert.py, which rewrites the
    table per batch for keyed latest-wins; this is the append path."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        TxnTable(batch.sparkSession, path).append(
            batch, app_id=app_id, txn_seq=batch_id
        )

    return fn
