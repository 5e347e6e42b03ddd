"""``txnlake`` — a Spark Python DataSource over transactional tables.

The native integration surface for :class:`~.txn.TxnTable`: after
``register_lake_source(spark)``, the lakehouse reads like any other
format —

    spark.read.format("txnlake").load(path)                  # latest
    spark.read.format("txnlake").option("version", 3).load(path)
    (spark.readStream.format("txnlake")
        .option("startingVersion", 0).load(path))            # CDC-ish

built on Spark 4's Python DataSource API (the public
``pyspark.sql.datasource`` ABCs — batch ``DataSourceReader`` with
``pushFilters`` and the partition-based ``DataSourceStreamReader``).
Everything the table layer guarantees carries over:

* **Snapshot isolation** — the reader pins its version at planning
  time; concurrent commits never tear a scan.
* **One partition per data file** — Spark schedules file-granular
  tasks; executors read parquet via pyarrow directly and never touch
  the driver's log state (partitions ship absolute paths + the
  per-file deletion-vector sidecar path + the physical→logical
  rename).
* **Filter pushdown → manifest pruning** — ``pushFilters`` keeps
  range/equality/null/prefix predicates, prunes FILES through the
  manifest stats (the same tiers ``snapshot_where_ranges`` uses), and
  still reports every filter as unsupported so Spark re-applies them
  row-exactly: pruning is a pure optimization, never a correctness
  dependency.
* **Deletion vectors & column mapping** — each partition drops its
  file's deleted positions and renames physical→logical before
  emitting Arrow batches.

Streaming follows Delta's source semantics: offsets are COMMIT
VERSIONS; each micro-batch reads the files its manifests appended;
pure layout changes (compact) contribute nothing; data-changing
rewrites (merge/delete/update/overwrite/restore) fail the stream
unless ``ignoreChanges=true``, which emits their added files (possible
re-deliveries, exactly Delta's contract).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructField, StructType

from etl_data_lake_spark.sources.txn import (
    TxnTable,
    _stat_key,
    _widen_iso,
    footer_stats,
)


@dataclass
class _FilePart(InputPartition):
    """Everything an executor needs — no driver state, no Spark.
    Carries a GROUP of files (driver-side sequential bin-packing, see
    :func:`_pack_files`): at 10⁶ small files one-task-per-file would
    mean 10⁶ task launches, so files pack into ~``maxBytesPerTask``
    bins in manifest order (clustered neighbors stay in one task)."""

    files: tuple  # ((abs parquet path, abs dv path | None), ...)
    renames: tuple  # ((physical, logical), ...) for mapped columns
    schema_json: str  # LOGICAL schema to emit


def _pack_files(entries, max_bytes: int):
    """Sequential greedy bin-packing of ``(abs_path, dv_path)`` pairs
    in MANIFEST ORDER (range-clustered neighbors land in the same
    task, keeping per-task locality) into bins of ~``max_bytes``.
    Sizes come from one local stat per file on the driver — this
    lake's files are committer-local by design; a remote object-store
    deployment would carry sizes in manifests instead. A file whose
    size cannot be read is isolated in its own bin (conservative)."""
    bins, cur, cur_bytes = [], [], 0
    for path, dv in entries:
        try:
            sz = os.stat(path).st_size
        except OSError:
            sz = max_bytes
        if cur and cur_bytes + sz > max_bytes:
            bins.append(tuple(cur))
            cur, cur_bytes = [], 0
        cur.append((path, dv))
        cur_bytes += sz
    if cur:
        bins.append(tuple(cur))
    return bins


def _pos(off: dict) -> tuple:
    """Stream offset dict → position ``(version, files_consumed)``:
    the stated version has ``files_consumed`` of its add-files
    consumed and every version below it is fully consumed. The
    legacy / common shape ``{"version": v}`` (no ``idx``) means v
    itself is fully consumed → position ``(v + 1, 0)`` — so old
    checkpoints keep working and an un-throttled stream still emits
    byte-identical offsets."""
    k = int(off.get("idx") or 0)
    v = int(off["version"])
    return (v, k) if k else (v + 1, 0)


def _off(pos: tuple) -> dict:
    """Position → offset dict (inverse of :func:`_pos`); positions at
    a version boundary serialize to the legacy shape so offset
    equality (Spark's no-new-data test) is stable across upgrades."""
    v, k = pos
    return {"version": v, "idx": k} if k else {"version": v - 1}


def _read_partition(part: _FilePart):
    """Executor-side: parquet → (drop DV positions) → (rename
    physical→logical, null-fill missing columns) → Arrow batches cast
    to the logical schema, for each file of the group. Pure pyarrow;
    runs in the Python worker. Only the schema's physical columns are
    read from each file (column pruning reaches the parquet footer —
    dropped/retired columns' bytes are never decoded), and the
    deletion-vector mask is built vectorized."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    schema = StructType.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(schema)
    logical_of = dict(part.renames)  # physical -> logical
    phys_of = {l: p for p, l in logical_of.items()}
    wanted = [phys_of.get(f.name, f.name) for f in schema.fields]
    for file_path, dv_path in part.files:
        available = set(pq.read_schema(file_path).names)
        table = pq.read_table(
            file_path, columns=[c for c in wanted if c in available]
        )
        if dv_path is not None:
            deleted = np.asarray(
                json.loads(Path(dv_path).read_text())["indices"],
                dtype=np.int64,
            )
            keep = np.ones(table.num_rows, dtype=bool)
            keep[deleted[deleted < table.num_rows]] = False
            table = table.filter(pa.array(keep))
        cols = []
        names = set(table.schema.names)
        for field, phys in zip(schema.fields, wanted):
            if phys in names:
                cols.append(table.column(phys))
            else:  # schema evolution: column newer than this file
                cols.append(pa.nulls(table.num_rows))
        out = pa.table(cols, names=[f.name for f in schema.fields])
        out = out.cast(target)
        yield from out.to_batches()


_CHANGE_COL = "_change_type"
_VERSION_COL = "_commit_version"


@dataclass
class _ChangePart(InputPartition):
    """One CHANGE-FEED task (readChangeFeed=true). ``mode``:

    * ``"cdc"`` — a materialized ``_cdc/`` file (enable_cdf): rows
      already carry ``_change_type``; emit verbatim.
    * ``"insert"`` / ``"delete"`` — a data file whose rows all have
      that change type (appends / overwrite sides / whole-file
      deletes), read with ``dv_path`` applied like a normal scan.
    * ``"dv_diff"`` — a kept file whose deletion vector grew: emit
      ONLY the newly-deleted positions (``dv_path`` minus
      ``dv_before_path``) as deletes — the exact merge-on-read
      change, no change files needed.
    """

    mode: str
    file_path: str
    dv_path: str | None
    dv_before_path: str | None
    renames: tuple
    schema_json: str  # TABLE logical schema (change cols appended)
    commit_version: int


def _read_change_partition(part: _ChangePart):
    """Executor-side change-feed read: pure pyarrow, mirrors
    :func:`_read_partition` plus change-type attribution."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import LongType, StringType

    schema = StructType.fromJson(json.loads(part.schema_json))
    out_schema = StructType(
        schema.fields
        + [
            StructField(_CHANGE_COL, StringType(), False),
            StructField(_VERSION_COL, LongType(), False),
        ]
    )
    target = to_arrow_schema(out_schema)
    logical_of = dict(part.renames)
    phys_of = {l: p for p, l in logical_of.items()}
    wanted = [phys_of.get(f.name, f.name) for f in schema.fields]
    extra = [_CHANGE_COL] if part.mode == "cdc" else []
    available = set(pq.read_schema(part.file_path).names)
    table = pq.read_table(
        part.file_path,
        columns=[c for c in wanted + extra if c in available],
    )
    if part.mode == "dv_diff":
        after = np.asarray(
            json.loads(Path(part.dv_path).read_text())["indices"],
            dtype=np.int64,
        )
        before: set = (
            set(
                json.loads(Path(part.dv_before_path).read_text())[
                    "indices"
                ]
            )
            if part.dv_before_path is not None
            else set()
        )
        newly = sorted(
            int(i) for i in after if i < table.num_rows and i not in before
        )
        table = table.take(pa.array(newly, type=pa.int64()))
    elif part.dv_path is not None:
        deleted = np.asarray(
            json.loads(Path(part.dv_path).read_text())["indices"],
            dtype=np.int64,
        )
        keep = np.ones(table.num_rows, dtype=bool)
        keep[deleted[deleted < table.num_rows]] = False
        table = table.filter(pa.array(keep))
    n = table.num_rows
    cols = []
    names = set(table.schema.names)
    for field, phys in zip(schema.fields, wanted):
        if phys in names:
            cols.append(table.column(phys))
        else:  # schema evolution: column newer than this file
            cols.append(pa.nulls(n))
    if part.mode == "cdc":
        ct = table.column(_CHANGE_COL)
    else:
        ctype = "delete" if part.mode == "dv_diff" else part.mode
        ct = pa.array(np.repeat(ctype, n)) if n else pa.array(
            [], type=pa.string()
        )
    cv = pa.array(np.full(n, part.commit_version, dtype=np.int64))
    out = pa.table(
        cols + [ct, cv],
        names=[f.name for f in schema.fields] + [_CHANGE_COL, _VERSION_COL],
    ).cast(target)
    for batch in out.to_batches():
        yield batch


def _plan_change_parts(
    table: TxnTable,
    table_schema: StructType,
    renames: tuple,
    start_v: int,
    end_v: int,
    manifests: dict | None = None,
    ignore_changes: bool = False,
) -> list[_ChangePart]:
    """Driver-side change-feed planning over (``start_v``, ``end_v``]:
    one pass of :meth:`TxnTable.file_and_dv_diffs` plus each version's
    manifest, mapped to :class:`_ChangePart` tasks.

    Exactly derivable without change files: appends (adds = inserts),
    overwrites (removes = deletes + adds = inserts), pure layout
    commits (nothing), merge-on-read DML (vector growth = deletes,
    appended rows = inserts), whole-file deletes (removes = deletes).
    A COW rewrite (removed AND added files) interleaves moved
    survivors with changed rows — underivable from the file diff; it
    needs the commit's materialized ``_cdc`` files
    (:meth:`TxnTable.enable_cdf`) and otherwise raises (or, with
    ``ignoreChanges=true``, degrades to emitting added files as
    inserts — Delta's contract, possible re-deliveries)."""
    sj = table_schema.json()
    root = table.root
    parts: list[_ChangePart] = []

    def emit(mode, rel, v, dv=None, dv_before=None):
        parts.append(
            _ChangePart(
                mode,
                str(root / rel),
                str(root / dv) if dv else None,
                str(root / dv_before) if dv_before else None,
                renames,
                sj,
                v,
            )
        )

    for v, added, removed, dv_changed in table.file_and_dv_diffs(
        start_v, end_v
    ):
        m = (manifests or {}).get(v) or table._read_manifest(v)
        op = m["operation"]
        cdc = m.get("cdc") or ()
        if cdc:
            for f in cdc:
                emit("cdc", f, v)
            continue
        if op in ("constraint", "schema", "stats", "props"):
            continue
        if op == "append":
            for f in added:
                emit("insert", f, v)
            continue
        is_replace = op == "compact" and "replace_where" in m.get(
            "params", {}
        )
        if op == "compact" and not is_replace:
            continue  # pure layout: compact/optimize/zorder/purge
        before = {f: o for f, (o, _n) in dv_changed.items()}
        after = {f: nn for f, (_o, nn) in dv_changed.items()}
        if op == "overwrite":
            for f in removed:
                emit("delete", f, v, dv=before.get(f))
            for f in added:
                emit("insert", f, v, dv=after.get(f))
            continue
        if op in ("delete", "update", "merge") and not removed:
            # merge-on-read shape: vector growth = the deletes,
            # appended files = the updated/inserted rows
            for f in sorted(set(dv_changed) - set(added) - set(removed)):
                if after.get(f):
                    emit(
                        "dv_diff", f, v,
                        dv=after[f], dv_before=before.get(f),
                    )
            for f in added:
                emit("insert", f, v, dv=after.get(f))
            continue
        if op == "delete" and not added:
            # whole files deleted, no survivors staged
            for f in sorted(set(dv_changed) - set(added) - set(removed)):
                if after.get(f):
                    emit(
                        "dv_diff", f, v,
                        dv=after[f], dv_before=before.get(f),
                    )
            for f in removed:
                emit("delete", f, v, dv=before.get(f))
            continue
        if not ignore_changes:
            raise ValueError(
                f"version {v} is a {op!r} rewrite without change "
                f"files: its row-level changes cannot be derived from "
                f"the file diff. Enable the change feed BEFORE the "
                f"change (TxnTable.enable_cdf()), start the read "
                f"after it, or set ignoreChanges=true to emit its "
                f"added files as inserts (possible re-deliveries)"
            )
        for f in added:
            emit("insert", f, v, dv=after.get(f))
    return parts


def _overlaps(rng, flt) -> bool:
    """Can a file with manifest stats entry ``rng`` contain a row
    matching ``flt``? Conservative: unknown → True.

    FLOAT stats never prune: parquet footers omit NaN from min/max
    (verified against pyarrow), while Spark SQL sorts NaN above every
    double — so a file holding [1.0, NaN] reports hi=1.0 yet its NaN
    row matches ``> 5.0``. Range knowledge over floats is therefore
    unsound for pruning and is ignored, like the engines that disable
    float pushdown for exactly this reason."""
    if rng is None:
        return True
    lo, hi = rng[0], rng[1]
    nulls = rng[2] if len(rng) >= 4 else None
    rows = rng[3] if len(rng) >= 4 else None
    if isinstance(flt, IsNull):
        return nulls is None or nulls > 0
    if isinstance(flt, IsNotNull):
        return nulls is None or rows is None or nulls < rows
    if lo is None:
        return True  # nulls-only entry: no range proof
    if isinstance(lo, float) or isinstance(hi, float):
        return True  # NaN-blind stats: see docstring
    def _triple(v):
        # _stat_key: date/timestamp filter values -> the manifest's
        # ISO-string stat form; _widen_iso width-reconciles a date
        # bound against timestamp stats (and vice versa) on BOTH stat
        # ends so every lexicographic compare matches cast semantics
        k = _stat_key(v)
        lo2, k2 = _widen_iso(lo, k)
        hi2, k2 = _widen_iso(hi, k2)
        return lo2, hi2, k2

    try:
        if isinstance(flt, EqualTo):
            lo2, hi2, k = _triple(flt.value)
            return lo2 <= k <= hi2
        if isinstance(flt, In):
            return any(
                lo2 <= k <= hi2
                for lo2, hi2, k in map(_triple, flt.value)
            )
        if isinstance(flt, GreaterThan):
            _, hi2, k = _triple(flt.value)
            return hi2 > k
        if isinstance(flt, GreaterThanOrEqual):
            _, hi2, k = _triple(flt.value)
            return hi2 >= k
        if isinstance(flt, LessThan):
            lo2, _, k = _triple(flt.value)
            return lo2 < k
        if isinstance(flt, LessThanOrEqual):
            lo2, _, k = _triple(flt.value)
            return lo2 <= k
        if isinstance(flt, StringStartsWith):
            # lo may itself start with the prefix while sorting above
            # prefix+U+10FFFF (a U+10FFFF inside lo) — startswith
            # catches that case exactly
            return hi >= flt.value and (
                lo.startswith(flt.value)
                or lo <= flt.value + "\U0010ffff"
            )
    except TypeError:
        return True  # incomparable stats type
    return True


class TxnLakeBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        path = options["path"]
        self._table = TxnTable(None, path)
        self._meta = self._table.snapshot_meta(_resolve_version(
            self._table, options
        ))
        if self._meta is None:
            raise FileNotFoundError(f"no committed version at {path}")
        self._schema = schema
        self._filters = []
        # task granularity: files bin-pack to ~this many bytes per
        # InputPartition (Delta's file-group motivation — a small-file
        # table must not become one task per file)
        self._max_bytes = int(
            options.get("maxBytesPerTask") or (128 << 20)
        )

    def planned_files(self) -> list[str]:
        """Manifest-pruned file list (exposed for tests)."""
        meta = self._meta
        keep = []
        for fl in meta.files:
            st = meta.file_stats.get(fl, {})
            if all(
                _overlaps(st.get(meta.phys(f.attribute[0])), f)
                for f in self._filters
            ):
                keep.append(fl)
        return keep

    def partitions(self):
        meta = self._meta
        root = self._table.root
        renames = tuple(
            (meta.phys(c), c)
            for c in self._schema.fieldNames()
            if meta.phys(c) != c
        )
        sj = self._schema.json()
        entries = [
            (
                str(root / fl),
                str(root / meta.file_dvs[fl])
                if fl in meta.file_dvs
                else None,
            )
            for fl in self.planned_files()
        ]
        return [
            _FilePart(group, renames, sj)
            for group in _pack_files(entries, self._max_bytes)
        ]

    def read(self, partition):
        return _read_partition(partition)


class TxnLakePushdownReader(TxnLakeBatchReader):
    """The batch reader with ``pushFilters`` — selected via
    ``.option("pushdown", "true")``. Split from the base class
    because Spark REJECTS any reader that merely implements
    pushFilters while ``spark.sql.python.filterPushdown.enabled`` is
    false (the default), and a vanilla session must still read the
    format. Enable both the conf and the option to get manifest-level
    file pruning from query predicates."""

    def pushFilters(self, filters):
        for f in filters:
            attr = getattr(f, "attribute", None)
            if (
                attr is not None
                and len(attr) == 1
                and attr[0] in self._schema.fieldNames()
            ):
                self._filters.append(f)
            yield f  # Spark re-applies EVERYTHING; pruning is bonus


class TxnLakeCdfBatchReader(DataSourceReader):
    """Batch CHANGE-FEED read (``readChangeFeed=true``):
    ``startingVersion`` (inclusive, default 1 = table start) ..
    ``endingVersion`` (default: the pinned latest) mapped to
    change partitions by :func:`_plan_change_parts`."""

    def __init__(self, options, schema: StructType):
        path = options["path"]
        self._table = TxnTable(None, path)
        latest = self._table.latest_version()
        if latest <= 0:
            raise FileNotFoundError(f"no committed version at {path}")
        ev = options.get("endingVersion")
        if ev is not None:
            self._end = int(ev)
        else:
            # honors an explicit version / timestampAsOf, else the
            # latest that schema() pinned at planning time
            pinned = _resolve_version(self._table, options)
            self._end = pinned if pinned is not None else latest
        sv = options.get("startingVersion")
        self._start = max(0, int(sv) - 1) if sv is not None else 0
        if self._end < self._start:
            raise ValueError(
                f"endingVersion {self._end} < startingVersion"
            )
        self._ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        # CDF schema = table schema + change columns; planning needs
        # the table part only
        self._table_schema = StructType(schema.fields[:-2])

    def partitions(self):
        meta = self._table.snapshot_meta(self._end)
        renames = tuple(
            (meta.phys(c), c)
            for c in self._table_schema.fieldNames()
            if meta.phys(c) != c
        )
        return _plan_change_parts(
            self._table,
            self._table_schema,
            renames,
            self._start,
            self._end,
            ignore_changes=self._ignore_changes,
        )

    def read(self, partition):
        return _read_change_partition(partition)


_SKIP_OPS = {"compact", "constraint", "schema", "stats", "props"}
_CHANGE_OPS = {"merge", "delete", "update", "overwrite", "restore"}


class TxnLakeStreamReader(DataSourceStreamReader):
    """Versions are offsets; each batch = the files appended in
    (start, end]. Partition-based (the scale path): executors read
    file-granular like the batch side.

    RATE LIMITING (``maxVersionsPerBatch``, round-4 verdict #4): an
    unbounded backlog after downtime otherwise lands in ONE
    micro-batch — Delta throttles with maxFilesPerTrigger for the same
    reason. Each ``latestOffset`` advances at most N versions past the
    planning high-water mark. ``maxFilesPerBatch`` /
    ``maxBytesPerBatch`` (Delta's maxFilesPerTrigger /
    maxBytesPerTrigger) throttle finer: offsets gain an ``idx``
    component (files of the stated version already consumed) so a
    batch boundary may land MID-version — a single giant backfill
    commit drains in bounded steps too. Bytes is a soft cap (admit
    until cumulative size reaches it, always at least one file);
    all three throttles compose, the tightest wins. File/byte
    throttles are version-granular-incompatible with
    ``readChangeFeed`` and are rejected there. The Python stream API never shows
    ``latestOffset`` the start offset — measured on this engine it
    fires BEFORE ``initialOffset`` even on a fresh checkpoint
    (Trigger.AvailableNow captures the offset at prepare time) — so
    the mark cannot be reconstructed from in-process call order alone
    and MUST be durable: ``maxVersionsPerBatch`` therefore requires a
    ``consumerId`` option naming this consumer, and the mark persists
    atomically under ``<table>/_stream_progress/<consumerId>.json``.
    A virgin consumer (no marker) seeds from ``startingVersion``;
    restarts resume from the marker, never below it, so a throttled
    end can never regress Spark's committed offset (the failure mode
    that re-emits versions). The mark may run AHEAD of Spark's
    committed offset by planned-but-uncommitted windows; recovery
    batches then span (committed, mark + N] — bounded, monotone,
    never a duplicate or a loss. Deleting a live consumer's marker
    file breaks that invariant — treat it like deleting a checkpoint.

    PREFETCH: planning an end offset eagerly reads the window's
    manifests into an in-memory cache that ``partitions`` drains, so
    each manifest is read once per batch even though two hooks need
    it."""

    def __init__(self, options, schema: StructType):
        self._path = options["path"]
        self._table = TxnTable(None, self._path)
        self._schema = schema
        # Delta semantics: startingVersion is INCLUSIVE — the offset
        # is "last consumed version", so version N itself is read
        # (0 and 1 both mean "from the table's beginning").
        # startingTimestamp (epoch ms) resolves to the first version
        # AT-OR-AFTER the stamp via the same skew-tolerant walk batch
        # time travel uses (Delta's inclusive contract: a version
        # stamped exactly at the timestamp IS delivered, and a stamp
        # preceding every commit streams from the table's beginning);
        # mutually exclusive with startingVersion, like Delta's.
        sv = options.get("startingVersion")
        st = options.get("startingTimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "set either startingVersion or startingTimestamp, "
                "not both"
            )
        if st is not None:
            ts = int(st)
            # start = (first version stamped AT-OR-AFTER the stamp) - 1,
            # found by a FORWARD manifest walk. Commit stamps are
            # advisory and may be non-monotone (writer clock skew —
            # version_as_of's documented tolerance), so a backward
            # walk from version_as_of could stop at a skewed
            # earlier-stamped commit and skip an exact-stamp version
            # behind it; the forward walk takes the FIRST qualifying
            # stamp, and later versions replay with it regardless of
            # their own stamps (conservative over-delivery under skew,
            # Delta's coarseness). One-time planning cost, O(first
            # qualifying version) tiny JSON point reads. Unstamped
            # legacy manifests carry no stamp and stay conservatively
            # consumed; a stamp newer than every commit starts at the
            # table head (only future commits stream).
            latest = self._table.latest_version()
            self._start = latest
            for v in range(1, latest + 1):
                ts_v = self._table._read_manifest(v).get("ts_ms")
                if ts_v is not None and ts_v >= ts:
                    self._start = v - 1
                    break
        else:
            self._start = max(0, int(sv if sv is not None else 1) - 1)
        self._ignore_changes = (
            str(options.get("ignoreChanges", "false")).lower() == "true"
        )
        mv = options.get("maxVersionsPerBatch")
        self._max_versions = int(mv) if mv is not None else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("maxVersionsPerBatch must be >= 1")
        mf = options.get("maxFilesPerBatch")
        self._max_files = int(mf) if mf is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("maxFilesPerBatch must be >= 1")
        mb = options.get("maxBytesPerBatch")
        self._max_batch_bytes = int(mb) if mb is not None else None
        if self._max_batch_bytes is not None and self._max_batch_bytes < 1:
            raise ValueError("maxBytesPerBatch must be >= 1")
        self._consumer = options.get("consumerId")
        throttled = (
            self._max_versions is not None
            or self._max_files is not None
            or self._max_batch_bytes is not None
        )
        if throttled and self._consumer is None:
            raise ValueError(
                "rate limiting (maxVersionsPerBatch / maxFilesPerBatch "
                "/ maxBytesPerBatch) requires a consumerId option: the "
                "throttle's planning mark must survive restarts (see "
                "TxnLakeStreamReader docstring) or a restarted stream "
                "could re-emit versions"
            )
        self._planned: tuple | None = self._load_marker()
        self._manifests: dict[int, dict] = {}
        self._max_bytes = int(
            options.get("maxBytesPerTask") or (128 << 20)
        )

    # ------------------------------ durable planning high-water mark --

    def _marker_path(self) -> Path:
        return (
            Path(self._path)
            / "_stream_progress"
            / f"{self._consumer}.json"
        )

    def _load_marker(self) -> tuple | None:
        if self._consumer is None:
            return None
        try:
            text = self._marker_path().read_text()
        except FileNotFoundError:
            return None  # virgin consumer — the only safe degrade
        except OSError as e:
            # a transient read failure must NOT look like a virgin
            # consumer: seeding from startingVersion could return a
            # latestOffset below Spark's committed offset and poison
            # the offset log (re-emission). Fail loudly instead.
            raise RuntimeError(
                f"cannot read stream-progress marker "
                f"{self._marker_path()}: {e}"
            ) from e
        try:
            data = json.loads(text)
            # legacy shape {"planned": v} = v fully consumed; the
            # file-throttle shape adds "idx" = add-files of version
            # planned already consumed (same scheme as offsets)
            return _pos(
                {"version": data["planned"], "idx": data.get("idx")}
            )
        except (ValueError, KeyError, TypeError) as e:
            raise RuntimeError(
                f"corrupt stream-progress marker "
                f"{self._marker_path()!s}; refusing to guess (a wrong "
                f"seed can regress the committed offset). Restore or "
                f"delete it ONLY together with the checkpoint."
            ) from e

    def _advance_mark(self, pos: tuple) -> None:
        if self._planned is not None and pos <= self._planned:
            return
        self._planned = pos
        if self._consumer is None:
            return
        p = self._marker_path()
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.parent / f".tmp-{uuid.uuid4().hex}"
        off = _off(pos)
        doc = {"planned": off["version"]}
        if off.get("idx"):
            doc["idx"] = off["idx"]
        tmp.write_text(json.dumps(doc))
        tmp.replace(p)

    def initialOffset(self) -> dict:
        self._advance_mark((self._start + 1, 0))
        return {"version": self._start}

    def latestOffset(self) -> dict:
        latest = self._table.latest_version()
        throttled = (
            self._max_versions is not None
            or self._max_files is not None
            or self._max_batch_bytes is not None
        )
        if not throttled:
            return {"version": latest}
        # virgin consumer (no marker yet): the stream has never
        # planned a batch, so startingVersion is the true base
        base = (
            self._planned
            if self._planned is not None
            else (self._start + 1, 0)
        )
        bv, bk = base
        # a mid-version base counts its version as the window's FIRST
        # (its remainder is not free): window = bv .. bv + N - 1
        # either way, since a bk == 0 base means bv - 1 is consumed
        v_cap = (
            latest
            if self._max_versions is None
            else min(latest, bv - 1 + self._max_versions)
        )
        if self._max_files is None and self._max_batch_bytes is None:
            end = max(base, (v_cap + 1, 0))
            self._advance_mark(end)
            self._prefetch(base, end)
            return _off(end)
        # file/byte walk: admit add-files in (version, manifest-order)
        # until a budget trips — an offset may land MID-version, so a
        # single giant backfill commit drains in bounded batches too
        # (Delta's maxFilesPerTrigger/maxBytesPerTrigger semantics;
        # bytes is a soft cap, always admitting at least one file)
        cur_v, cur_k = bv, bk
        admitted, nbytes = 0, 0
        root = self._table.root
        while cur_v <= v_cap:
            # budget checks BEFORE touching the next version's
            # manifest: an exhausted budget must neither read ahead
            # nor trip _effective_adds' data-change error — the
            # admitted backlog has to reach its batch first
            if self._max_files is not None and admitted >= self._max_files:
                break
            if (
                self._max_batch_bytes is not None
                and admitted
                and nbytes >= self._max_batch_bytes
            ):
                break
            try:
                files = self._effective_adds(cur_v)
            except ValueError:
                if admitted or (cur_v, cur_k) > base:
                    # deliver what the walk admitted; the error
                    # surfaces on the NEXT latestOffset, whose base
                    # then starts AT the offending version (Delta
                    # fails when the stream reaches the change, not
                    # before delivering the backlog ahead of it)
                    break
                raise
            if cur_k >= len(files):
                cur_v, cur_k = cur_v + 1, 0
                continue
            if self._max_batch_bytes is not None:
                try:
                    nbytes += os.stat(root / files[cur_k]).st_size
                except OSError:  # pragma: no cover - racing vacuum
                    nbytes += self._max_batch_bytes
            cur_k += 1
            admitted += 1
        if cur_k and cur_k >= len(self._effective_adds(cur_v)):
            # a budget that trips EXACTLY at a version boundary leaves
            # (v, len(files)) — normalize to (v+1, 0) so the next
            # window's maxVersionsPerBatch doesn't spend a slot on the
            # already-fully-consumed version (cur_k > 0 means cur_v's
            # manifest was fetched this walk, so no new read/raise)
            cur_v, cur_k = cur_v + 1, 0
        end = max(base, (cur_v, cur_k))
        self._advance_mark(end)
        return _off(end)

    def _prefetch(self, base: tuple | None, end: tuple) -> None:
        if base is None:
            return
        last = end[0] if end[1] else end[0] - 1
        for v in range(base[0], last + 1):
            if v not in self._manifests:
                try:
                    self._manifests[v] = self._table._read_manifest(v)
                except OSError:  # pragma: no cover - vacuumed mid-plan
                    return  # partitions() will fail loudly instead

    def _effective_adds(self, v: int) -> list:
        """Version v's add-files under streaming op-routing (cached
        manifest read): appends emit, rewrite-family layout ops emit
        nothing, data-changing ops raise unless ``ignoreChanges``."""
        m = self._manifests.get(v)
        if m is None:
            m = self._table._read_manifest(v)
            self._manifests[v] = m
        op = m["operation"]
        # replace_where publishes as 'compact' (rewrite-family
        # replay) but is a DATA CHANGE — the op_params audit
        # trail distinguishes it from pure layout compaction,
        # which really does contribute nothing to a stream
        if op == "compact" and "replace_where" in m.get("params", {}):
            op = "overwrite"  # route to the data-change branch
        if op == "append":
            return list(m.get("add", ()))
        if op in _SKIP_OPS:
            return []
        if op in _CHANGE_OPS:
            if not self._ignore_changes:
                raise ValueError(
                    f"version {v} is a data-changing {op!r} commit; "
                    f"streaming a txn table follows append-only "
                    f"semantics (set ignoreChanges=true to emit its "
                    f"added files, with possible re-deliveries)"
                )
            return list(m.get("add", ()))
        raise ValueError(f"unknown operation {op!r} at v{v}")

    def partitions(self, start: dict, end: dict):
        # a replayed batch after restart reaches here without a
        # latestOffset call — its end is a planning fact too
        spos, epos = _pos(start), _pos(end)
        self._advance_mark(epos)
        (sv, sk), (ev, ek) = spos, epos
        last_v = ev if ek else ev - 1  # last version the batch touches
        meta = self._table.snapshot_meta(last_v)
        root = self._table.root
        renames = tuple(
            (meta.phys(c), c)
            for c in self._schema.fieldNames()
            if meta.phys(c) != c
        )
        sj = self._schema.json()
        entries = []
        for v in range(sv, last_v + 1):
            files = self._effective_adds(v)
            lo = sk if v == sv else 0
            hi = ek if (v == ev and ek) else len(files)
            entries.extend((str(root / fl), None) for fl in files[lo:hi])
        # evict fully-consumed manifests; a mid-version end keeps its
        # manifest cached for the next batch's remainder slice
        for v in list(self._manifests):
            if v < ev:
                self._manifests.pop(v, None)
        # one packing across the whole planned window: rows carry no
        # version attribution in a plain stream, so a backlog replay
        # of many small appends drains in size-bounded tasks instead
        # of one task per historical file
        return [
            _FilePart(group, renames, sj)
            for group in _pack_files(entries, self._max_bytes)
        ]

    def read(self, partition):
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream's checkpoint


class TxnLakeCdfStreamReader(TxnLakeStreamReader):
    """Streaming CHANGE FEED (``readChangeFeed=true`` on readStream —
    Delta's streaming CDF): each micro-batch emits the row-level
    changes of its version window with ``_change_type`` /
    ``_commit_version`` attribution instead of just appended files.
    Offsets, rate limiting (maxVersionsPerBatch + consumerId) and
    manifest prefetch are inherited; only the window→partitions
    mapping differs (:func:`_plan_change_parts` — materialized
    ``_cdc`` files when the table property is on, exact derivation
    for append/overwrite/MOR shapes, loud failure for underivable
    COW rewrites unless ``ignoreChanges=true``)."""

    def __init__(self, options, schema: StructType):
        super().__init__(options, schema)
        if self._max_files is not None or self._max_batch_bytes is not None:
            raise ValueError(
                "maxFilesPerBatch/maxBytesPerBatch are not supported "
                "with readChangeFeed: change attribution is "
                "version-granular (a version's delete/update shape "
                "cannot be split mid-file-list); throttle with "
                "maxVersionsPerBatch instead"
            )

    def partitions(self, start: dict, end: dict):
        self._advance_mark(_pos(end))
        meta = self._table.snapshot_meta(end["version"])
        table_schema = StructType(self._schema.fields[:-2])
        renames = tuple(
            (meta.phys(c), c)
            for c in table_schema.fieldNames()
            if meta.phys(c) != c
        )
        manifests = {
            v: self._manifests.pop(v)
            for v in range(start["version"] + 1, end["version"] + 1)
            if v in self._manifests
        }
        return _plan_change_parts(
            self._table,
            table_schema,
            renames,
            start["version"],
            end["version"],
            manifests=manifests,
            ignore_changes=self._ignore_changes,
        )

    def read(self, partition):
        return _read_change_partition(partition)


def _resolve_version(table: TxnTable, options) -> int | None:
    """``version`` / ``timestampAsOf`` (epoch ms) options → pinned
    version (None = latest). Mutually exclusive, like Delta's."""
    version = options.get("version")
    ts = options.get("timestampAsOf")
    if version is not None and ts is not None:
        raise ValueError("set either version or timestampAsOf, not both")
    if ts is not None:
        return table.version_as_of(int(ts))
    return int(version) if version is not None else None


@dataclass
class _WroteFiles(WriterCommitMessage):
    files: tuple  # manifest-relative paths this task staged


class TxnLakeBatchWriter(DataSourceArrowWriter):
    """``df.write.format("txnlake").mode("append"|"overwrite")`` —
    executor tasks stage one parquet file each into a fresh
    write-once stage dir (pyarrow, Arrow batches straight from
    Spark), and the driver-side ``commit`` publishes them through
    the table's optimistic commit protocol: append evolution rules,
    CHECK-constraint validation, column mapping, manifest stats (via
    the ``statsCols`` option) and crash atomicity all apply exactly
    as they do for ``TxnTable.append`` — a failed job leaves only an
    invisible stage dir for vacuum."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self._path = options["path"]
        self._stats_cols = tuple(
            c.strip()
            for c in str(options.get("statsCols", "")).split(",")
            if c.strip()
        )
        self._overwrite = overwrite
        self._schema = schema
        meta = TxnTable(None, self._path).snapshot_meta()
        # overwrite pins its base HERE, before any task stages — a
        # commit landing during the write job must abort the
        # overwrite (WriteSerializable), not be silently clobbered by
        # a version re-read at commit time
        self._expected_base = meta.version if meta is not None else None
        self._renames = tuple(
            (c, meta.phys(c)) for c in schema.fieldNames()
        ) if meta is not None and meta.column_map else ()
        self._stage_rel = f"data/{uuid.uuid4().hex}"

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _WroteFiles(())  # zero-row task: stage nothing
        table = pa.Table.from_batches(batches)
        if self._renames:
            phys = dict(self._renames)
            table = table.rename_columns(
                [phys.get(n, n) for n in table.schema.names]
            )
        rel = f"{self._stage_rel}/part-{uuid.uuid4().hex}.parquet"
        p = Path(self._path) / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, p)
        return _WroteFiles((rel,))

    def commit(self, messages):
        from pyspark.sql import SparkSession

        staged = sorted(
            f for m in messages if m is not None for f in m.files
        )
        table = TxnTable(SparkSession.getActiveSession(), self._path)
        phys_stats = tuple(
            dict(self._renames).get(c, c) for c in self._stats_cols
        )
        stats = footer_stats(table.root, staged, phys_stats)
        if self._overwrite:
            table._commit(
                "overwrite",
                staged,
                self._schema.json(),
                None,
                None,
                staged_stats=stats,
                expected_base=self._expected_base,
            )
        else:
            table._commit(
                "append",
                staged,
                self._schema.json(),
                None,
                None,
                staged_stats=stats,
            )

    def abort(self, messages):
        # delete exactly the files the messages name (a task that died
        # before reporting leaves an invisible orphan for vacuum);
        # never rmtree a dir — a long-lived stream writer can reuse
        # its stage dir across batches and earlier batches' files are
        # already committed
        for m in messages:
            if m is not None:
                for rel in m.files:
                    (Path(self._path) / rel).unlink(missing_ok=True)


class TxnLakeStreamWriter(TxnLakeBatchWriter, DataSourceStreamWriter):
    """``writeStream.format("txnlake")`` — EXACTLY-ONCE by
    construction: the micro-batch id is the transaction sequence for
    the stream's ``appId`` option (default 'txnlake-stream'), so a
    replayed batch's commit no-ops at the writer watermark, the same
    guarantee ``txn_append_sink`` gives foreachBatch users but as a
    first-class sink format."""

    def __init__(self, options, schema: StructType):
        super().__init__(options, schema, overwrite=False)
        self._app_id = str(options.get("appId", "txnlake-stream"))

    def commit(self, messages, batchId: int) -> None:
        from pyspark.sql import SparkSession

        staged = sorted(
            f for m in messages if m is not None for f in m.files
        )
        table = TxnTable(SparkSession.getActiveSession(), self._path)
        phys_stats = tuple(
            dict(self._renames).get(c, c) for c in self._stats_cols
        )
        table._commit(
            "append",
            staged,
            self._schema.json(),
            self._app_id,
            batchId,
            staged_stats=footer_stats(table.root, staged, phys_stats),
        )

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        super().abort(messages)


class TxnLakeDataSource(DataSource):
    """``spark.read.format("txnlake")`` /
    ``spark.readStream.format("txnlake")`` over a TxnTable path."""

    @classmethod
    def name(cls) -> str:
        return "txnlake"

    def schema(self) -> StructType:
        table = TxnTable(None, self.options["path"])
        v = _resolve_version(table, self.options)
        if v is None:
            # pin 'latest' HERE: schema negotiation and reader
            # planning must see the SAME snapshot, or a concurrent
            # overwrite between the two could pair version-N's schema
            # with version-N+1's files (torn read)
            v = table.latest_version()
        self._pinned_version = v
        meta = table.snapshot_meta(v)
        if meta is None:
            raise FileNotFoundError(
                f"no committed version at {self.options['path']}"
            )
        if self._cdf_mode():
            from pyspark.sql.types import LongType, StringType

            return StructType(
                meta.schema().fields
                + [
                    StructField(_CHANGE_COL, StringType(), False),
                    StructField(_VERSION_COL, LongType(), False),
                ]
            )
        return meta.schema()

    def _cdf_mode(self) -> bool:
        return (
            str(self.options.get("readChangeFeed", "false")).lower()
            == "true"
        )

    def _reader_options(self):
        from pyspark.sql.datasource import CaseInsensitiveDict

        opts = CaseInsensitiveDict(dict(self.options))
        if (
            opts.get("version") is None
            and opts.get("timestampAsOf") is None
            and getattr(self, "_pinned_version", None) is not None
        ):
            opts["version"] = str(self._pinned_version)
        return opts

    def reader(self, schema: StructType) -> DataSourceReader:
        opts = self._reader_options()
        if self._cdf_mode():
            return TxnLakeCdfBatchReader(opts, schema)
        if str(opts.get("pushdown", "false")).lower() == "true":
            return TxnLakePushdownReader(opts, schema)
        return TxnLakeBatchReader(opts, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._cdf_mode():
            return TxnLakeCdfStreamReader(self.options, schema)
        return TxnLakeStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return TxnLakeBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            # Complete/Truncate output mode would need every batch to
            # replace the table; silently appending would accumulate
            # stale aggregate rows — refuse honestly
            raise ValueError(
                "txnlake streaming sink supports append output mode "
                "only; for complete-mode aggregates use foreachBatch "
                "with TxnTable.overwrite or merge_upsert_sink"
            )
        return TxnLakeStreamWriter(self.options, schema)


def register_lake_source(spark) -> None:
    """Register the ``txnlake`` format on this session (idempotent)."""
    spark.dataSource.register(TxnLakeDataSource)
