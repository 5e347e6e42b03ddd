"""Keyed MERGE INTO for transactional tables — the lakehouse upsert.

The reference writes tables by overwriting whole parquet directories
(``/root/reference/etl.py:74-76``): updating one user's rows means
rewriting everything. This module is the row-level answer: a
copy-on-write MERGE in the Delta Lake style (Armbrust et al., VLDB
2020 — see PAPERS.md), built on :class:`~.txn.TxnTable`'s manifest
log and optimistic commit protocol.

Semantics (SQL MERGE restricted to equi-key conditions)::

    MERGE INTO target t USING source s ON t.k1 = s.k1 AND ...
    WHEN MATCHED [AND <matched_condition>] THEN UPDATE SET * | DELETE
    WHEN NOT MATCHED THEN INSERT *

Execution is the two-pass touched-file algorithm that makes MERGE
viable at 100 TB:

1. **Prune.** The source's per-key-column [min, max] hull prunes the
   target's file list through manifest stats — files provably
   disjoint from the source's key space are never opened.
2. **Probe (pass 1).** The surviving candidate files are scanned with
   ONLY the key columns projected (column pruning reaches the parquet
   footers) and semi-joined against the source's distinct keys; files
   containing at least one match are the TOUCHED set. At merge-shaped
   workloads (a CDC batch against a big table) this is the step that
   turns "rewrite the table" into "rewrite a handful of files".
3. **Rewrite (pass 2).** Touched files are read in full and
   full-outer-joined with the source on the keys: matched rows are
   updated or deleted, unmatched target rows survive verbatim,
   unmatched source rows become inserts. Untouched files are never
   read, never rewritten, and keep their manifest stats.
4. **Commit.** One atomic ``merge`` commit replaces exactly the
   touched files. The conflict rule extends compaction's: any
   CONCURRENT commit (landing after the merge's snapshot) that added a
   file whose stats may contain a source key aborts with
   :class:`~.txn.ConcurrentWriteError` — otherwise rows that should
   have matched would silently dodge the merge (Delta raises
   ConcurrentAppendException here). Files already present in the
   merge's own base snapshot are exempt from that stats guard: pass 1
   probed them exactly, which is strictly stronger evidence than
   min/max overlap.

The source is persisted (memory-with-spill) for the duration: the
algorithm evaluates it in several jobs (bounds, probe, ambiguity
check, rewrite), and a non-deterministic source evaluated per-job
could match in pass 1 but miss in pass 2. In CDC practice the source
is the small side; the big side never shuffles — pass 1 is a
broadcast-friendly semi join and pass 2 touches only matched files.

Ambiguity: if more than one source row matches the same target key
and a WHEN MATCHED clause exists, the merge raises
:class:`MergeAmbiguityError` (SQL and Delta both reject this —
"attempt to update the same row twice"). Insert-only merges tolerate
duplicate source keys, matching Delta.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from etl_data_lake_spark.sources import bloomindex
from etl_data_lake_spark.sources.txn import (
    TxnTable,
    _expr_refs,
    _generated_defs,
    largest_gap_ranges,
    merge_schemas,
)


class MergeAmbiguityError(ValueError):
    """>= 2 source rows match one target key under a WHEN MATCHED
    clause — the update/delete would be order-dependent."""


@dataclass(frozen=True)
class MergeResult:
    """What the merge did, for observability and tests."""

    version: int  # committed (or current, for a no-op) version
    committed: bool  # False: nothing to do, no commit published
    files_rewritten: int  # touched files replaced by the commit
    files_candidate: int  # files surviving the stats prune (pass 1 input)
    files_total: int  # files in the base snapshot
    files_vectored: int = 0  # files that got a deletion vector (MOR)


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def merge_into(
    table: TxnTable,
    source: DataFrame,
    keys: list[str] | str,
    when_matched: str | None = "update",
    when_not_matched: str | None = "insert",
    matched_condition: str | None = None,
    update_exprs: dict[str, str] | None = None,
    stats_cols: tuple[str, ...] = (),
    app_id: str | None = None,
    txn_seq: int | None = None,
    max_guard_keys: int = 4096,
    max_guard_ranges: int = 8,
    use_bloom: bool = True,
    mor: bool = False,
    max_dv_rows: int = 1_000_000,
) -> MergeResult:
    """MERGE ``source`` into ``table`` on equality of ``keys``.

    ``when_matched``: ``"update"`` (SET * by name: target columns that
    exist in the source take the source's value, others keep the
    target's), ``"delete"``, or None (leave matched rows alone).
    ``update_exprs`` overrides SET * per column: ``{"col": "<sql>"}``
    with the target row as alias ``t`` and the source row as ``s``
    (e.g. ``{"n": "t.n + s.n"}``).
    ``matched_condition``: extra SQL predicate over ``t``/``s``; a
    matched row failing it is left alone (WHEN MATCHED AND ...).
    ``when_not_matched``: ``"insert"`` (INSERT * by name, missing
    columns null) or None.

    Schema evolution is additive like append: source-only columns
    widen the table (existing rows read null); a type conflict raises
    SchemaEvolutionError before anything is staged.

    EVERY key column feeds the concurrency guard as a conjunction
    (a concurrent file conflicts only if it may intersect the source
    key space on all keys at once): the first key's source values
    gap-split into <= ``max_guard_ranges`` tight ranges when there
    are at most ``max_guard_keys`` distinct numeric values (hull
    otherwise); later keys contribute their [min, max] hull, which
    under conjunction can only remove false conflicts.

    ``use_bloom``: when the table carries Bloom sidecars for the first
    key column (sources/bloomindex.py — the unclustered-point-lookup
    tier), pass 1 probes them with the source's distinct first-key
    values (bounded by ``max_guard_keys``) to shrink the candidate
    file set BEFORE the exact key scan — on a CDC batch against a big
    unclustered table, where every file's [min, max] hull overlaps,
    this is the tier that keeps pass 1 from scanning the table. A file
    without a sidecar is conservatively kept; correctness never
    depends on the filter (no false negatives by construction).

    ``mor=True`` switches pass 2 to MERGE-ON-READ (Delta's deletion-
    vector merge): instead of rewriting every touched file, the
    matched-and-hit rows are recorded in per-file deletion vectors and
    (for update) their transformed versions appended — a CDC batch
    brushing K near-gigabyte files writes K tiny sidecars plus one
    data file. Unmatched rows of touched files are never read twice
    nor rewritten, and their manifest stats survive. Bounded by
    ``max_dv_rows`` matched rows (beyond that the copy-on-write
    rewrite amortizes — same guidance as delete_where_mor); the commit
    carries the expected per-file vectors, so racing vector writers
    conflict instead of losing deletes.

    ``(app_id, txn_seq)`` makes the commit idempotent under replay,
    exactly like append — a MERGE-per-micro-batch ``foreachBatch``
    sink gets exactly-once upserts for free. A merge that matches
    nothing and inserts nothing publishes no commit (and records no
    watermark — there is nothing a replay could double-apply).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("merge_into needs >= 1 key column")
    if when_matched not in ("update", "delete", None):
        raise ValueError(f"when_matched={when_matched!r}")
    if when_not_matched not in ("insert", None):
        raise ValueError(f"when_not_matched={when_not_matched!r}")
    if when_matched is None and when_not_matched is None:
        raise ValueError("merge with no clauses would be a no-op")
    if update_exprs and when_matched != "update":
        raise ValueError("update_exprs requires when_matched='update'")
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks key columns {missing}")

    base = table.snapshot_meta()

    if base is not None and base.identity:
        # pass 2 would append matched rewrites AND inserted source
        # rows in one staged set — inserts need watermark allocation,
        # rewrites must carry values verbatim, and _commit cannot
        # tell them apart. Until merge grows an allocating insert
        # path, fail loudly rather than mint colliding keys.
        raise ValueError(
            f"merge into a table with identity columns "
            f"{sorted(base.identity)} is not supported; append new "
            f"rows through TxnTable.append and update in place"
        )

    if base is None or not base.files:
        # empty / absent target: everything is NOT MATCHED. Validate
        # update_exprs against the only schema there is (a typo must
        # fail fast here too, not become data-dependent)
        bad = set(update_exprs or ()) - set(source.columns)
        if bad:
            raise ValueError(
                f"update_exprs for unknown columns {sorted(bad)}"
            )
        if when_not_matched is None:
            return MergeResult(table.latest_version(), False, 0, 0, 0)
        # (a generated column the source lacks is computed by append)
        v = table.append(
            source, app_id=app_id, txn_seq=txn_seq, stats_cols=stats_cols
        )
        return MergeResult(v, True, 0, 0, 0)

    gens = _generated_defs(base.props)
    if gens:
        # GENERATED ALWAYS columns: the merge's output rows come from
        # the SOURCE (SET * / inserts), so the source must carry the
        # column with correct values — the commit invariant validates
        # them, a mismatch fails loudly. A source that omits it would
        # silently null-fill inserted rows; reject instead (compute it
        # into the source with the generation expression). update_exprs
        # may target neither a generated column (GENERATED ALWAYS) nor
        # one of its referenced columns (the stored generated value
        # would go stale; merge does not recompute — put the new value
        # in the source instead).
        lacking = sorted(set(gens) - set(source.columns))
        if lacking:
            raise ValueError(
                f"merge source lacks generated column(s) {lacking}; "
                f"compute them into the source (table."
                f"generated_columns() has the expressions) so inserted "
                f"rows carry correct values"
            )
        direct = sorted(set(update_exprs or ()) & set(gens))
        if direct:
            raise ValueError(
                f"column(s) {direct} are GENERATED ALWAYS and cannot "
                f"take update_exprs; the source's values win via SET *"
            )
        stale = sorted(
            g
            for g, e in gens.items()
            if any(_expr_refs(e, t) for t in (update_exprs or ()))
        )
        if stale:
            raise ValueError(
                f"update_exprs touch columns that generated column(s) "
                f"{stale} derive from; merge does not recompute — "
                f"apply the change in the source instead"
            )

    target_schema = base.schema()
    missing = [k for k in keys if k not in target_schema.fieldNames()]
    if missing:
        raise ValueError(f"target lacks key columns {missing}")
    # fail fast on type conflicts AND update_exprs typos, before any
    # job runs — a config error must not be data-dependent (it used
    # to surface only when at least one file was touched)
    final_schema = merge_schemas(target_schema, source.schema)
    bad = set(update_exprs or ()) - set(final_schema.fieldNames())
    if bad:
        raise ValueError(f"update_exprs for unknown columns {sorted(bad)}")

    source = source.persist()
    try:
        return _merge_against(
            table,
            base,
            source,
            keys,
            when_matched,
            when_not_matched,
            matched_condition,
            update_exprs,
            final_schema,
            stats_cols,
            app_id,
            txn_seq,
            max_guard_keys,
            max_guard_ranges,
            use_bloom,
            mor,
            max_dv_rows,
        )
    finally:
        source.unpersist()


def _merge_against(
    table: TxnTable,
    base,
    source: DataFrame,
    keys: list[str],
    when_matched: str | None,
    when_not_matched: str | None,
    matched_condition: str | None,
    update_exprs: dict[str, str] | None,
    final_schema: StructType,
    stats_cols: tuple[str, ...],
    app_id: str | None,
    txn_seq: int | None,
    max_guard_keys: int,
    max_guard_ranges: int,
    use_bloom: bool = True,
    mor: bool = False,
    max_dv_rows: int = 1_000_000,
) -> MergeResult:
    spark = table.spark

    # ---- pass 0: source key bounds -> manifest stats prune ----------
    bounds = source.agg(
        *[F.min(k).alias(f"lo_{i}") for i, k in enumerate(keys)],
        *[F.max(k).alias(f"hi_{i}") for i, k in enumerate(keys)],
    ).collect()[0]
    ranges = {
        k: (bounds[f"lo_{i}"], bounds[f"hi_{i}"])
        for i, k in enumerate(keys)
        if bounds[f"lo_{i}"] is not None
    }
    if not ranges and when_not_matched is None:
        # source empty or all-null keys: nothing can match
        return MergeResult(base.version, False, 0, 0, len(base.files))
    candidates = (
        table.files_matching(ranges, base.version)[0] if ranges else []
    )

    # ---- pass 1: exact key probe over candidates (keys only) --------
    # null keys never match (SQL equality), so they are dropped from
    # the probe side; null-keyed source rows surface as inserts later
    src_keys = (
        source.select(*keys)
        .where(F.expr(" AND ".join(f"{k} IS NOT NULL" for k in keys)))
        .distinct()
    )

    # ---- bloom tier: shrink candidates before the exact scan --------
    # On an UNCLUSTERED table every file's [min, max] hull overlaps the
    # source keys and the stats prune keeps everything; per-file Bloom
    # sidecars on the first key (if built) drop files that provably
    # contain none of the source's first-key values — a file with no
    # first-key match cannot match on the full composite key either.
    # The probe needs the distinct values driver-side, so it only runs
    # for CDC-shaped batches (<= max_guard_keys distinct keys); the
    # collected values are reused by the commit guard below.
    k0 = keys[0]
    k0_vals: list | None = None
    if (
        use_bloom
        and candidates
        and k0 in ranges
        and any(
            bloomindex.sidecar_exists(table, f, k0, meta=base)
            for f in candidates
        )
    ):
        vals = [
            r[0]
            for r in src_keys.select(k0)
            .distinct()
            .limit(max_guard_keys + 1)
            .collect()
        ]
        if 0 < len(vals) <= max_guard_keys:
            k0_vals = vals
            candidates = bloomindex.files_matching_eq(
                table, k0, vals, base.version, files=candidates
            )[0]

    touched: list[str] = []
    if candidates:
        # DV-aware read (a row deleted by a deletion vector must not
        # mark its file as touched); keep_file_col carries the
        # manifest-relative path, so no URI mapping is needed
        cand = table.read_files(
            base, candidates, keep_file_col="__file"
        ).select(*keys, "__file")
        probed = (
            cand.join(src_keys, on=keys, how="left_semi")
            .select("__file")
            .distinct()
            .collect()
        )
        cand_set = set(candidates)
        for r in probed:
            rel = r["__file"]
            if rel not in cand_set:  # pragma: no cover - layout invariant
                raise RuntimeError(f"probed file {rel!r} not in candidates")
            touched.append(rel)
        touched.sort()

    # ---- ambiguity: >=2 source rows per matched key -----------------
    if when_matched is not None and touched:
        dup_keys = (
            source.groupBy(*keys).count().where(F.col("count") > 1).drop("count")
        )
        t_keys = table.read_files(base, touched).select(*keys)
        amb = dup_keys.join(t_keys, on=keys, how="left_semi").limit(1).count()
        if amb:
            raise MergeAmbiguityError(
                "multiple source rows match the same target key; "
                "aggregate the source to one row per key first"
            )

    # ---- pass 2: build the rewritten + inserted rows ----------------
    fields = final_schema.fields
    t_cols = set(base.schema().fieldNames())
    s_cols = set(source.columns)

    def t_or_null(f):
        return (
            F.col(f"t.{f.name}") if f.name in t_cols
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)

    def s_or_null(f):
        return (
            F.col(f"s.{f.name}") if f.name in s_cols
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)

    pieces: list[DataFrame] = []
    replaced_files: tuple[str, ...] = tuple(touched)
    dv_updates: dict[str, str] = {}
    expected_dvs: dict[str, str | None] = {}
    to_unpersist = None
    # CHANGE DATA FEED: when the table property is on, every row the
    # merge touches is also staged under _cdc/ with its change type —
    # updates carry pre/post attribution the commit's file diff cannot
    # reconstruct (the added files mix updated rows with verbatim
    # survivors and inserts)
    cdf_on = table.cdf_enabled(base)
    cdc_frames: list[tuple[DataFrame, str]] = []
    if when_matched is not None and touched and mor:
        # ---- merge-on-read pass 2: vector + append, no rewrites -----
        t = (
            table._read_with_positions(base, touched, base.schema())
            .withColumn("__t", F.lit(True))
            .alias("t")
        )
        s = source.withColumn("__s", F.lit(True)).alias("s")
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else (cond & c)
        joined = t.join(s, on=cond, how="full_outer")
        is_matched = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
        hit = (
            is_matched & F.expr(matched_condition)
            if matched_condition is not None
            else is_matched
        )
        # persisted through staging: the DV build collects the hit
        # positions and the staged update rows must be the same rows
        hit_rows = joined.where(F.coalesce(hit, F.lit(False))).persist()
        to_unpersist = hit_rows
        n = hit_rows.count()
        if n > max_dv_rows:
            hit_rows.unpersist()
            raise ValueError(
                f"{n} matched rows exceed max_dv_rows={max_dv_rows}; "
                f"use mor=False (copy-on-write) for bulk merges"
            )
        dv_updates, expected_dvs = table._build_dv_updates(
            base,
            hit_rows.select(
                F.col("t.__dv_file").alias("__dv_file"),
                F.col("t.__dv_pos").alias("__dv_pos"),
            ),
        )
        if when_matched == "update":
            upd = []
            for f in fields:
                if update_exprs and f.name in update_exprs:
                    upd.append(
                        F.expr(update_exprs[f.name])
                        .cast(f.dataType).alias(f.name)
                    )
                elif f.name in s_cols:
                    upd.append(s_or_null(f))
                else:
                    upd.append(t_or_null(f))
            pieces.append(hit_rows.select(*upd))
            if cdf_on:
                cdc_frames += [
                    (
                        hit_rows.select(*[t_or_null(f) for f in fields]),
                        "update_preimage",
                    ),
                    (hit_rows.select(*upd), "update_postimage"),
                ]
        elif cdf_on:  # when_matched == "delete": the vector IS the change
            cdc_frames.append(
                (
                    hit_rows.select(*[t_or_null(f) for f in fields]),
                    "delete",
                )
            )
        if when_not_matched == "insert":
            ins = joined.where(F.col("t.__t").isNull()).select(
                *[s_or_null(f) for f in fields]
            )
            pieces.append(ins)
            if cdf_on:
                cdc_frames.append((ins, "insert"))
        replaced_files = ()
    elif when_matched is None:
        # insert-only fast path (Delta's optimization): matched rows
        # are untouched, so no file is rewritten at all — the commit
        # is a guarded pure-add of the unmatched source rows
        if when_not_matched == "insert":
            if touched:
                t_keys = table.read_files(base, touched).select(*keys)
                inserts = source.join(t_keys, on=keys, how="left_anti")
            else:
                inserts = source
            ins = inserts.alias("s").select(
                *[s_or_null(f) for f in fields]
            )
            pieces.append(ins)
            if cdf_on:
                cdc_frames.append((ins, "insert"))
        touched = []
        replaced_files = ()
    elif touched:
        t = (
            table.read_files(base, touched)
            .withColumn("__t", F.lit(True))
            .alias("t")
        )
        s = source.withColumn("__s", F.lit(True)).alias("s")
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else (cond & c)
        joined = t.join(s, on=cond, how="full_outer")
        if cdf_on:
            # the join feeds the rewrite AND the change frames: one
            # evaluation (unpersisted after both are staged)
            joined = joined.persist()
            to_unpersist = joined
        is_matched = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
        if matched_condition is not None:
            hit = is_matched & F.expr(matched_condition)
        else:
            hit = is_matched
        hit_true = F.coalesce(hit, F.lit(False))
        t_row = [t_or_null(f) for f in fields]
        if when_matched == "update":
            upd = []  # update_exprs validated up-front in merge_into
            for f in fields:
                if update_exprs and f.name in update_exprs:
                    upd.append(
                        F.expr(update_exprs[f.name]).cast(f.dataType).alias(f.name)
                    )
                elif f.name in s_cols:
                    upd.append(s_or_null(f))
                else:
                    upd.append(t_or_null(f))
            kept_or_updated = joined.where(
                F.col("t.__t").isNotNull()
            ).select(
                *[F.when(hit, u).otherwise(tr).alias(f.name)
                  for f, u, tr in zip(fields, upd, t_row)]
            )
            if cdf_on:
                cdc_frames += [
                    (joined.where(hit_true).select(*t_row),
                     "update_preimage"),
                    (joined.where(hit_true).select(*upd),
                     "update_postimage"),
                ]
        elif when_matched == "delete":
            kept_or_updated = joined.where(
                F.col("t.__t").isNotNull() & ~hit_true
            ).select(*t_row)
            if cdf_on:
                cdc_frames.append(
                    (joined.where(hit_true).select(*t_row), "delete")
                )
        else:  # no matched clause: every target row survives verbatim
            kept_or_updated = joined.where(
                F.col("t.__t").isNotNull()
            ).select(*t_row)
        pieces.append(kept_or_updated)
        if when_not_matched == "insert":
            ins = joined.where(F.col("t.__t").isNull()).select(
                *[s_or_null(f) for f in fields]
            )
            pieces.append(ins)
            if cdf_on:
                cdc_frames.append((ins, "insert"))
    elif when_not_matched == "insert":
        # no touched files: every source row with a (possibly null) key
        # is an insert — but only keys absent from the table, and with
        # no touched files NO source key is present in the table
        ins = source.alias("s").select(*[s_or_null(f) for f in fields])
        pieces.append(ins)
        if cdf_on:
            cdc_frames.append((ins, "insert"))

    if not pieces and not dv_updates:
        return MergeResult(
            base.version, False, 0, len(candidates), len(base.files)
        )

    # ---- commit ------------------------------------------------------
    if pieces:
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        staged, _schema_json, stats = table._stage(out, stats_cols)
    else:  # MOR delete-only merge: the vectors are the whole change
        staged, stats = [], {}
    cdc = (
        table._stage_cdc(cdc_frames, final_schema, dict(base.column_map))
        if cdc_frames
        else None
    )
    if to_unpersist is not None:
        to_unpersist.unpersist()
    if not replaced_files and not staged and not dv_updates:
        # insert-only merge that inserted nothing: _stage drops
        # zero-row part files, so an empty `staged` IS the row check —
        # no re-evaluation of `source`, nothing to commit (the orphan
        # stage dir is invisible and reclaimed by vacuum)
        return MergeResult(
            base.version, False, 0, len(candidates), len(base.files)
        )

    # Conjunction guard over EVERY key column: a concurrent file
    # conflicts only if its stats may intersect the source's key space
    # on ALL keys at once — a file overlapping key 1's hull but
    # provably disjoint on key 2 rebases cleanly. The first key gets
    # tight gap-split ranges (it is the clustering key in practice);
    # later keys contribute their [min, max] hull, which under
    # conjunction semantics can only REMOVE false conflicts.
    guard = None
    if ranges:
        gspec: dict[str, list[tuple]] = {
            k: [r] for k, r in ranges.items()
        }
        if k0 in ranges:
            lo, hi = ranges[k0]
            if _is_num(lo) and _is_num(hi):
                vals = k0_vals
                if vals is None:
                    vals = [
                        r[0]
                        for r in src_keys.select(k0)
                        .distinct()
                        .limit(max_guard_keys + 1)
                        .collect()
                    ]
                if 0 < len(vals) <= max_guard_keys and all(
                    _is_num(v) for v in vals
                ):
                    gspec[k0] = largest_gap_ranges(vals, max_guard_ranges)
        guard = gspec

    v = table._commit(
        "merge",
        staged,
        final_schema.json(),
        app_id,
        txn_seq,
        replaced=replaced_files,
        staged_stats=stats,
        # COW path: declare the deletion-vector view the rewrite was
        # built from, so a concurrent MOR delete on a touched file
        # conflicts instead of being silently resurrected (MOR path:
        # replaced_files is empty and expected_dvs carries the
        # vectored files' view from _build_dv_updates)
        guard_range=guard,
        # base-snapshot files were probed EXACTLY in pass 1; only files
        # committed after our snapshot get the (conservative) stats guard
        guard_exempt=tuple(base.files),
        dv_updates=dv_updates or None,
        expected_dvs=(
            expected_dvs
            or {f: base.file_dvs.get(f) for f in replaced_files}
            or None
        ),
        op_params={
            "keys": keys,
            "when_matched": when_matched,
            "when_not_matched": when_not_matched,
            **({"mor": True} if mor else {}),
        },
        cdc=cdc,
    )
    return MergeResult(
        v, True, len(replaced_files), len(candidates), len(base.files),
        len(dv_updates),
    )


def merge_upsert_sink(
    path: str,
    keys: list[str] | str,
    app_id: str = "merge-stream",
    stats_cols: tuple[str, ...] = (),
    mor: bool = False,
):
    """``foreachBatch`` function turning a micro-batch stream into
    exactly-once keyed upserts on a txn table: the batch id is the
    transaction seq, so a replayed batch's merge no-ops instead of
    double-applying. The scalable sibling of streaming/upsert.py's
    whole-table rewrite — each batch rewrites only the files its keys
    actually live in; ``mor=True`` goes further and writes deletion
    vectors instead of rewrites (schedule ``purge_vectors`` /
    ``optimize_small_files`` as the compaction companion, the
    standard streaming-CDC pairing)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        merge_into(
            TxnTable(batch.sparkSession, path),
            batch,
            keys,
            app_id=app_id,
            txn_seq=batch_id,
            stats_cols=stats_cols,
            mor=mor,
        )

    return fn
