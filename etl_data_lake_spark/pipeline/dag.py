"""Declarative pipeline DAG — tables as named builder functions with
dependencies, data-quality expectation gates, and transactional
publication. The Delta-Live-Tables-shaped orchestration layer the
reference's ``main()`` hand-sequences (etl.py:207-227 runs
process_song_data then process_log_data in fixed order with implicit
quality assumptions); here the order is derived from declared
dependencies, the quality assumptions are named expectations with an
audit trail, and a failed gate stops the DOWNSTREAM subtree instead of
publishing garbage.

Semantics:

* ``@pipeline.table(name, deps=..., expectations=..., on_violation=...)``
  registers a builder ``(spark, **dep_frames) -> DataFrame``;
* ``run`` topologically orders the tables (deterministic: declaration
  order among ready nodes), builds each from its dependencies'
  PUBLISHED frames, evaluates all expectations in one pass
  (operators/expectations), and publishes;
* ``on_violation``: ``"fail"`` (default — violating table does not
  publish and everything downstream is SKIPPED, the DLT "expect or
  fail" gate), ``"drop"`` (quarantine: only passing rows publish —
  "expect or drop"), or ``"warn"`` (publish everything, audit only);
* publication targets ``TxnTable`` directories under ``root`` when a
  root is given (atomic, snapshot-isolated — a crashed run never
  leaves a half-table; downstream reads the committed snapshot;
  ``drop`` mode also publishes the quarantined rows to
  ``{name}__quarantine`` so violations stay inspectable), else stays
  in-memory for tests/composition;
* a gated builder's frame is PERSISTED across the gate and the
  publication, so the rows the expectations validated are the rows
  that publish — a nondeterministic or time-varying builder cannot
  sneak an unvalidated row past a passing audit;
* the run's audit artifact is :class:`RunResult`: ``status`` per
  table, ``audit`` rows per (table, rule), ``frames`` and
  ``quarantined`` frames by name.

INCREMENTAL REFRESH (:meth:`Pipeline.refresh`): declare external
sources as ``pipeline.input(name, path)`` — transactional tables
whose VERSION NUMBERS are the change signal. A run records, per
published table, the version vector of its transitive input closure
(one atomic JSON doc under ``root``); ``refresh`` then recomputes
ONLY the tables whose vector moved — an appended log refreshes
songplays/time but never touches songs/artists (the reference
pipeline's etl.py:207-227 DAG under test_pipeline_dag). Tables
declared ``incremental_on="<input>"`` go further: when ONLY that
input changed and the change feed is pure inserts, the builder runs
over the DELTA rows alone and the result APPENDS — refresh cost
∝ |new rows|, the matview/CDF cost model generalized to arbitrary
row-wise builders (joins against broadcast dims included). Builders
must be deterministic functions of their inputs for skip-correctness
— the standard incremental-build contract; a non-insert feed (delete/
compaction) or a sibling-dep change falls back to a full rebuild of
that table, never a wrong append.

Crash atomicity: every publish stamps its input-version vector into
the txn commit's params (``dag_applied``) — atomic with the data,
unlike the state file written after it. A crash in that window leaves
the state LAGGING the table; the next refresh reads the stamp, repairs
the state without re-running the builder (status ``recovered``), and
bounds any later delta at the STAMPED version — the same delta is
never appended twice (ADVICE r8).

Scale: orchestration is driver-side metadata only — every data
movement is the builders' own Spark plans plus one expectations scan
per gated table; nothing here collects data rows. Refresh adds one
version probe per input (manifest metadata) and, for delta paths, a
change-feed read bounded by the files the appends touched.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.expectations import (
    expectations_report,
    quarantine,
)


@dataclass
class _TableDef:
    name: str
    builder: Callable[..., DataFrame]
    deps: tuple[str, ...]
    expectations: Callable[[], dict[str, Column]] | None
    on_violation: str
    unique: tuple[tuple[str, ...], ...]
    incremental_on: str | None = None


@dataclass
class RunResult:
    """Outcome of one pipeline run: published frames by table name,
    per-table status (``published`` / ``published_dropped_rows`` /
    ``failed`` / ``skipped``), and the audit rows (table, rule,
    n_rows, n_violations, violation_frac, passed) for every evaluated
    expectation."""

    frames: dict[str, DataFrame] = field(default_factory=dict)
    status: dict[str, str] = field(default_factory=dict)
    audit: list[tuple] = field(default_factory=list)
    quarantined: dict[str, DataFrame] = field(default_factory=dict)


class Pipeline:
    """A named collection of dependent table builders."""

    def __init__(self, name: str):
        self.name = name
        self._tables: dict[str, _TableDef] = {}
        self._inputs: dict[str, str] = {}

    def input(self, name: str, path: str) -> None:
        """Declare an external source: a transactional table at
        ``path`` (sources/txn.TxnTable) whose committed VERSION is the
        change signal for :meth:`refresh`. Builders name inputs in
        ``deps`` exactly like tables and receive the committed
        snapshot frame."""
        if not name.isidentifier():
            raise ValueError(
                f"input name must be a Python identifier, got {name!r}"
            )
        if name in self._inputs or name in self._tables:
            raise ValueError(f"name {name!r} already registered")
        self._inputs[name] = path

    def table(
        self,
        name: str,
        deps: tuple[str, ...] = (),
        expectations: Callable[[], dict[str, Column]] | None = None,
        on_violation: str = "fail",
        unique: tuple[tuple[str, ...], ...] = (),
        incremental_on: str | None = None,
    ):
        """Decorator registering a builder. ``expectations`` is a
        ZERO-ARG callable returning the rules dict (Column construction
        needs an active SparkSession, so rules must build lazily at run
        time, not at decoration time); ``unique`` lists key tuples that
        must be duplicate-free (audited like any rule; gate-only — a
        duplicate cannot be row-dropped, so it fails/warns but never
        participates in ``drop`` quarantining).

        ``incremental_on`` names the ONE input dep this builder is
        row-wise over (every output row derives from exactly one input
        row — maps, filters, dim-joins): :meth:`refresh` may then run
        the builder on just the input's insert delta and APPEND. The
        other deps still arrive as full published frames; ``drop``
        mode is rejected here because quarantine overwrite semantics
        don't compose with appends."""
        if on_violation not in ("fail", "drop", "warn"):
            raise ValueError(
                f"on_violation must be fail|drop|warn, got {on_violation!r}"
            )
        if incremental_on is not None:
            if incremental_on not in deps:
                raise ValueError(
                    f"incremental_on {incremental_on!r} must be one of "
                    f"deps {deps}"
                )
            if on_violation == "drop":
                raise ValueError(
                    "incremental_on tables support fail|warn only"
                )
            if unique:
                # uniqueness is TABLE-granular: a delta-only audit
                # cannot see a new row duplicating an already-published
                # one, so a green gate would lie — refuse up front
                raise ValueError(
                    "incremental_on tables cannot carry unique= specs "
                    "(the delta gate cannot validate cross-append "
                    "uniqueness); enforce the key on the input table "
                    "or use a full-rebuild table"
                )
        if not name.isidentifier():
            # the name is used as a builder KEYWORD ARGUMENT and a
            # filesystem path segment under root — reject separators,
            # dashes, dots and anything else Python can't bind
            raise ValueError(
                f"table name must be a Python identifier, got {name!r}"
            )

        def deco(fn: Callable[..., DataFrame]):
            # checked HERE, not at table() time: two decorators created
            # before either is applied must still collide
            if name in self._tables or name in self._inputs:
                raise ValueError(f"table {name!r} already registered")
            self._tables[name] = _TableDef(
                name, fn, tuple(deps), expectations, on_violation,
                tuple(tuple(k) for k in unique), incremental_on,
            )
            return fn

        return deco

    def _order(self) -> list[_TableDef]:
        """Deterministic topological order (declaration order among
        ready nodes); raises on unknown or cyclic dependencies."""
        for t in self._tables.values():
            for d in t.deps:
                if d not in self._tables and d not in self._inputs:
                    raise ValueError(
                        f"table {t.name!r} depends on unknown {d!r}"
                    )
            if (
                t.incremental_on is not None
                and t.incremental_on not in self._inputs
            ):
                raise ValueError(
                    f"table {t.name!r} incremental_on "
                    f"{t.incremental_on!r} must be a declared input"
                )
        done: set[str] = set(self._inputs)
        out: list[_TableDef] = []
        pending = list(self._tables.values())
        while pending:
            ready = [t for t in pending if set(t.deps) <= done]
            if not ready:
                cyc = sorted(t.name for t in pending)
                raise ValueError(f"dependency cycle among {cyc}")
            for t in ready:
                out.append(t)
                done.add(t.name)
            pending = [t for t in pending if t.name not in done]
        return out

    # ------------------------------------------------ input plumbing --

    def _input_tables(self, spark: SparkSession) -> dict:
        from etl_data_lake_spark.sources.txn import TxnTable

        return {
            n: TxnTable(spark, p) for n, p in self._inputs.items()
        }

    def _input_closure(self) -> dict[str, frozenset[str]]:
        """table → the set of inputs it transitively depends on."""
        out: dict[str, frozenset[str]] = {}
        for t in self._order():  # topological: deps resolved first
            s: set[str] = set()
            for d in t.deps:
                if d in self._inputs:
                    s.add(d)
                else:
                    s |= out[d]
            out[t.name] = frozenset(s)
        return out

    @staticmethod
    def _state_path(root: str) -> Path:
        return Path(root) / "__dag_state__.json"

    def _read_state(self, root: str) -> dict[str, dict[str, int]]:
        try:
            return json.loads(self._state_path(root).read_text())
        except (OSError, ValueError):
            return {}

    @staticmethod
    def _applied_vector(tbl) -> dict[str, int] | None:
        """The input-version vector stamped on the table's most recent
        DAG publish — read from the commit log, newest first. This is
        the CRASH-ATOMIC record of which input state the content
        reflects: the stamp commits WITH the data, so a crash between
        publish and the state-file write cannot desynchronize them
        (the state file can only lag, never lie). O(commits since the
        last DAG publish) manifest reads — normally 1."""
        before = tbl.latest_version() + 1
        while before > 1:
            page = tbl.history(limit=16, before=before)
            if not page:
                return None
            for m in reversed(page):
                vec = m["params"].get("dag_applied")
                if vec is not None:
                    return {k: int(v) for k, v in vec.items()}
            before = page[0]["version"]
        return None

    def _write_state(
        self, root: str, state: dict[str, dict[str, int]]
    ) -> None:
        p = self._state_path(root)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.parent / f".tmp-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(state, sort_keys=True))
        os.replace(tmp, p)

    # ----------------------------------------------------- execution --

    def _publish_one(
        self,
        spark: SparkSession,
        t: _TableDef,
        dep_frames: dict[str, DataFrame],
        root: str | None,
        stats_cols: dict[str, tuple[str, ...]] | None,
        res: RunResult,
        blocked: set[str],
        append_delta: bool = False,
        applied_vector: dict[str, int] | None = None,
    ) -> bool:
        """Build, gate, and publish one table; returns True when it
        published (False = failed gate, recorded + blocked). With
        ``append_delta`` the builder output APPENDS to the committed
        table instead of overwriting it (the incremental row-wise
        path; requires root). ``applied_vector`` (input-version
        vector) rides the txn commit's params so the table itself
        records which input state its content reflects — the
        crash-atomic source of truth :meth:`refresh` consults when
        the state file lags the commit (ADVICE r8)."""
        df = t.builder(spark, **dep_frames)
        status = "appended_delta" if append_delta else "published"
        gated = t.expectations is not None or t.unique
        cached = None
        published = False
        if gated:
            # the rows the gate validates must BE the rows that
            # publish: persist across the report collect and the
            # overwrite/downstream reuse, or a nondeterministic /
            # time-varying builder re-executes past a passing audit
            cached = df = df.persist()
        try:
            if gated:
                rules = t.expectations() if t.expectations else {}
                rep = expectations_report(
                    df, rules, unique=t.unique
                ).collect()
                res.audit += [
                    (t.name, r["rule"], r["n_rows"],
                     r["n_violations"], r["violation_frac"],
                     r["passed"])
                    for r in rep
                ]
                dirty = any(not r["passed"] for r in rep)
                row_dirty = any(
                    not r["passed"] and r["rule"] in rules
                    for r in rep
                )
                if dirty and t.on_violation == "fail":
                    res.status[t.name] = "failed"
                    blocked.add(t.name)
                    return False
                # only ROW-rule violations are droppable; a dirty
                # unique spec under "drop" publishes with the audit
                # showing it (a duplicate is not one bad row)
                if row_dirty and t.on_violation == "drop":
                    df, bad = quarantine(df, rules)
                    res.quarantined[t.name] = bad
                    status = "published_dropped_rows"
            if root is not None:
                from etl_data_lake_spark.sources.txn import TxnTable

                tbl = TxnTable(spark, f"{root}/{t.name}")
                cols = (stats_cols or {}).get(t.name, ())
                stamp = (
                    {"dag_applied": applied_vector}
                    if applied_vector is not None
                    else None
                )
                if append_delta:
                    tbl.append(df, stats_cols=cols, op_params=stamp)
                else:
                    tbl.overwrite(df, stats_cols=cols, op_params=stamp)
                df = tbl.snapshot()
                if t.name in res.quarantined:
                    # violations stay inspectable, not just counted
                    qt = TxnTable(spark, f"{root}/{t.name}__quarantine")
                    qt.overwrite(res.quarantined[t.name])
                    res.quarantined[t.name] = qt.snapshot()
            published = True
        finally:
            # root mode republishes from the committed snapshot, so
            # the builder cache can go; a FAILED gate's cache
            # (published=False) goes too, as does a cache orphaned by
            # a raising builder/report/publish — a crashed run never
            # leaves frames pinned. Only the SUCCESSFUL in-memory
            # gated frame stays persisted: unpersisting it would let
            # downstream consumption recompute the builder past the
            # audit, the exact hole the persist closes. (Long
            # in-memory pipelines: use root mode, or clearCache after
            # run.)
            if cached is not None and (root is not None or not published):
                cached.unpersist()
        res.frames[t.name] = df
        res.status[t.name] = status
        return True

    def run(
        self,
        spark: SparkSession,
        root: str | None = None,
        stats_cols: dict[str, tuple[str, ...]] | None = None,
    ) -> RunResult:
        """Execute the DAG in full. With ``root``, each table publishes
        atomically to ``{root}/{name}`` as a TxnTable overwrite (crash
        = old snapshot survives) and downstream builders read the
        COMMITTED snapshot; without it, frames pass through in memory.
        When inputs are declared and ``root`` is set, the run also
        records each table's reflected input-version vector so a later
        :meth:`refresh` can skip unchanged subtrees."""
        res = RunResult()
        blocked: set[str] = set()  # failed tables and their subtree
        inputs = self._input_tables(spark)
        input_versions = {n: tb.latest_version() for n, tb in inputs.items()}
        closure = self._input_closure()
        state = self._read_state(root) if root is not None else {}
        for t in self._order():
            if any(d in blocked for d in t.deps):
                res.status[t.name] = "skipped"
                blocked.add(t.name)
                continue
            # input snapshots PIN the probed version: every builder in
            # one run sees the same committed state even if a writer
            # lands mid-run, and the recorded vector is true
            dep_frames = {
                d: (
                    inputs[d].snapshot(input_versions[d])
                    if d in inputs
                    else res.frames[d]
                )
                for d in t.deps
            }
            vector = {n: input_versions[n] for n in closure[t.name]}
            ok = self._publish_one(
                spark, t, dep_frames, root, stats_cols, res, blocked,
                applied_vector=vector if root is not None else None,
            )
            if ok and root is not None:
                state[t.name] = vector
                self._write_state(root, state)
        return res

    def refresh(
        self,
        spark: SparkSession,
        root: str,
        stats_cols: dict[str, tuple[str, ...]] | None = None,
    ) -> RunResult:
        """Incrementally bring the published DAG up to date with its
        inputs: a table recomputes iff its transitive input-version
        vector moved (or an upstream table recomputed); everything
        else reports ``fresh`` and its committed snapshot passes
        through untouched — zero reads, zero writes. A changed table
        whose ``incremental_on`` input is the ONLY change and whose
        feed is pure inserts builds over the DELTA rows and appends
        (``appended_delta``); any delete/compaction in the feed or a
        sibling-dep change falls back to a full rebuild. State
        advances per table, atomically, AFTER its publish — a crash
        mid-refresh re-runs only the unfinished suffix, and a crash
        BETWEEN a publish and its state write recovers from the
        vector stamped on the commit itself (status ``recovered``)
        instead of re-running or double-appending."""
        from etl_data_lake_spark.sources.txn import TxnTable

        res = RunResult()
        blocked: set[str] = set()
        recomputed: set[str] = set()
        inputs = self._input_tables(spark)
        input_versions = {n: tb.latest_version() for n, tb in inputs.items()}
        closure = self._input_closure()
        state = self._read_state(root)
        for t in self._order():
            if any(d in blocked for d in t.deps):
                res.status[t.name] = "skipped"
                blocked.add(t.name)
                continue
            vector = {n: input_versions[n] for n in closure[t.name]}
            prev = state.get(t.name)
            upstream_moved = any(d in recomputed for d in t.deps)
            if prev == vector and not upstream_moved:
                res.frames[t.name] = TxnTable(
                    spark, f"{root}/{t.name}"
                ).snapshot()
                res.status[t.name] = "fresh"
                continue
            # the state file says work is needed — but the state write
            # is NOT atomic with the publish. Consult the vector
            # stamped on the table's own commit (crash-atomic): when
            # it already equals the target, the crashed run published
            # this table and died before recording it — repair the
            # state instead of re-running the builder (and, on a delta
            # table, instead of APPENDING THE SAME DELTA TWICE).
            stamped = None
            if not upstream_moved and root is not None:
                stamped = self._applied_vector(
                    TxnTable(spark, f"{root}/{t.name}")
                )
                if stamped == vector:
                    res.frames[t.name] = TxnTable(
                        spark, f"{root}/{t.name}"
                    ).snapshot()
                    res.status[t.name] = "recovered"
                    recomputed.add(t.name)
                    state[t.name] = vector
                    self._write_state(root, state)
                    continue
            append_delta = False
            persisted_changes = None
            if (
                t.incremental_on is not None
                and prev is not None
                and not upstream_moved
            ):
                # delta path only when EVERY other dep's signal is
                # unchanged and this input moved forward
                inc = t.incremental_on
                others_same = all(
                    prev.get(n) == vector.get(n)
                    for n in vector
                    if n != inc
                )
                # the stamp also bounds the delta's LOW end: after a
                # publish-then-crash the state's version lags the
                # table's true content, and replaying from the stale
                # version would duplicate the already-appended rows
                last_v = max(
                    prev.get(inc, 0),
                    (stamped or {}).get(inc, 0),
                )
                cur_v = vector.get(inc, 0)
                if others_same and 0 < last_v < cur_v:
                    changes = inputs[inc].table_changes(
                        last_v, cur_v
                    ).persist()
                    try:
                        non_insert = changes.where(
                            F.col("_change_type") != "insert"
                        ).limit(1).count()
                    except Exception:
                        changes.unpersist()
                        raise
                    if non_insert == 0:
                        append_delta = True
                        persisted_changes = changes
                    else:
                        changes.unpersist()
            dep_frames = {}
            for d in t.deps:
                if d == t.incremental_on and append_delta:
                    dep_frames[d] = persisted_changes.drop("_change_type")
                elif d in inputs:
                    # pinned to the probed version, like run()
                    dep_frames[d] = inputs[d].snapshot(input_versions[d])
                else:
                    dep_frames[d] = res.frames[d]
            try:
                ok = self._publish_one(
                    spark, t, dep_frames, root, stats_cols, res,
                    blocked, append_delta=append_delta,
                    applied_vector=vector,
                )
            finally:
                if persisted_changes is not None:
                    persisted_changes.unpersist()
            if ok:
                recomputed.add(t.name)
                state[t.name] = vector
                self._write_state(root, state)
        return res
