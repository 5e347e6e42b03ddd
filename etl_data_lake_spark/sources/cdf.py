"""Incremental change-data-feed consumption for txn tables.

``TxnTable.table_changes(a, b)`` answers "what changed between two
versions" as one batch. This module turns that into a CONSUMER
PIPELINE: a durable offset, per-commit-version change attribution,
and an exactly-once downstream pattern — the way a 100 TB lake feeds
its derived tables without ever rescanning the base (the same role
Delta's CDF + streaming reads play; matview.py is the specialized
aggregate instance of this general mechanism).

Cost model: each consumed version reads only the files its manifest
added/removed (O(Δ) — the property that makes CDC usable at scale);
the offset is one tiny JSON document, atomically replaced.

Delivery is at-least-once (crash between processing and offset write
replays the span); EFFECTS become exactly-once when the processor
writes through a txn commit carrying ``(app_id, v_to)`` — the replay
hits the writer watermark and no-ops. :func:`process_changes` wires
exactly that composition; the end-to-end crash-replay property is
pinned in tests/test_cdf.py.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from etl_data_lake_spark.sources.txn import TxnTable


def read_offset(state_path: str) -> int:
    """Last fully-processed version recorded at ``state_path``
    (0 = never consumed / fresh consumer)."""
    try:
        return int(json.loads(Path(state_path).read_text())["version"])
    except (OSError, ValueError, KeyError, TypeError):
        return 0


def write_offset(state_path: str, version: int) -> None:
    """Atomically record ``version`` as fully processed."""
    p = Path(state_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.parent / f".tmp-{uuid.uuid4().hex}"
    tmp.write_text(json.dumps({"version": int(version)}))
    os.replace(tmp, p)


def changes_between(
    table: TxnTable, v_from: int, v_to: int
) -> DataFrame | None:
    """Row-level changes over (``v_from``, ``v_to``] with per-commit
    attribution: ``_change_type`` ('insert' | 'delete' — plus
    'update_preimage' / 'update_postimage' for versions that carry
    materialized change files, see :meth:`TxnTable.enable_cdf`) and
    ``_commit_version`` — each version's diff comes straight from its
    own manifest's _cdc files when present (O(changed rows)), else
    from its add/remove file lists, so a consumer sees changes
    in commit order and a pure compaction contributes nothing. None
    when the span is empty. Schema-evolution-safe: spans are unioned
    by name (missing columns null). Note one deliberate divergence
    matching Delta: with change files, an UPDATE that SET a row to
    its existing values still reports the row (pre == post), where
    the value-diff fallback would cancel it."""
    if v_to <= v_from:
        return None
    # ONE snapshot reconstruction + one manifest read per version
    # (TxnTable.file_and_dv_diffs), not two reconstructions per step;
    # the widest schema (at v_to) reads every span, since evolution is
    # additive. Plan size still grows with the span — bounded
    # consumers pass max_versions via incremental_changes.
    from etl_data_lake_spark.sources.txn import Snapshot

    end = table.snapshot_meta(v_to)
    schema = end.schema()

    def read(files: list[str], dvs: dict[str, str]) -> DataFrame:
        if not files:
            return table.spark.createDataFrame([], schema)
        # a synthetic snapshot carries exactly the DV state this side
        # of the version boundary should see
        side = Snapshot(
            version=-1, operation="", files=tuple(files),
            schema_json=end.schema_json, writer_txns={}, file_stats={},
            file_dvs={f: dvs[f] for f in files if f in dvs},
            # physical names are stable, so the END map resolves every
            # span's files even if a rename happened mid-span
            column_map=dict(end.column_map),
        )
        return table.read_files(side, files, schema=schema)

    out = None
    for v, added, removed, dv_changed in table.file_and_dv_diffs(
        v_from, v_to
    ):
        # MATERIALIZED CHANGE DATA first (tables with the cdf property
        # on, post-enable DML commits): the manifest's _cdc files ARE
        # the change set — O(changed rows), no multiset diff, and
        # updates carry update_preimage/update_postimage attribution a
        # file diff cannot reconstruct. An empty cdc list falls
        # through to the diff, which agrees (it computes empty for a
        # commit that changed nothing).
        cdc_files = table._read_manifest(v).get("cdc") or ()
        if cdc_files:
            d = table.read_cdc_files(
                end, list(cdc_files), schema
            ).withColumn("_commit_version", F.lit(v).cast("long"))
            out = d if out is None else out.unionByName(d)
            continue
        # a file live on both sides with a changed deletion vector
        # contributes rows on both sides (old-DV view vs new-DV view);
        # the multiset difference surfaces exactly the MOR deletes.
        # dv_changed also carries added/removed files' vector state so
        # each side reads them with the vectors it actually had —
        # without the removed side's, a compaction of a previously
        # MOR-deleted file would re-report those rows as deletes
        before_dvs = {f: p for f, (p, _n) in dv_changed.items() if p}
        after_dvs = {f: p for f, (_o, p) in dv_changed.items() if p}
        both = sorted(set(dv_changed) - set(added) - set(removed))
        a = read(added + both, after_dvs)
        r = read(removed + both, before_dvs)
        d = (
            a.exceptAll(r).withColumn("_change_type", F.lit("insert"))
            .unionByName(
                r.exceptAll(a).withColumn("_change_type", F.lit("delete"))
            )
            .withColumn("_commit_version", F.lit(v).cast("long"))
        )
        out = d if out is None else out.unionByName(d)
    return out


def incremental_changes(
    table: TxnTable,
    state_path: str,
    max_versions: int | None = None,
) -> tuple[DataFrame | None, int, int]:
    """→ (changes, v_from, v_to): everything committed since this
    consumer's offset, optionally capped at ``max_versions`` commits
    per call (bounded batches under backlog). Does NOT advance the
    offset — call :func:`write_offset` after the changes are durably
    processed, or use :func:`process_changes` for the full loop."""
    v_from = read_offset(state_path)
    v_to = table.latest_version()
    if max_versions is not None:
        v_to = min(v_to, v_from + max_versions)
    return changes_between(table, v_from, v_to), v_from, v_to


def process_changes(
    table: TxnTable,
    state_path: str,
    fn: Callable[[DataFrame, int], None],
    max_versions: int | None = None,
) -> int:
    """Consume one batch: ``fn(changes, v_to)`` then advance the
    offset. At-least-once delivery; pass ``v_to`` as the txn seq of
    any commit ``fn`` makes (with a stable app_id) and effects are
    exactly-once under replay. Returns the new offset (unchanged when
    there was nothing to consume)."""
    changes, v_from, v_to = incremental_changes(
        table, state_path, max_versions
    )
    if changes is None:
        return v_from
    fn(changes, v_to)
    write_offset(state_path, v_to)
    return v_to


def cdc_mirror_sink(target_path: str, app_id: str = "cdc-mirror"):
    """Processor for :func:`process_changes` that maintains an
    append-only MIRROR-WITH-HISTORY of the source's change stream in a
    downstream txn table (every insert/delete event, with its commit
    version — an audit log you can aggregate later). Exactly-once via
    the (app_id, v_to) watermark."""

    def fn(changes: DataFrame, v_to: int) -> None:
        TxnTable(changes.sparkSession, target_path).append(
            changes, app_id=app_id, txn_seq=v_to
        )

    return fn
