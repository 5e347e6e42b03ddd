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

Scale: orchestration is driver-side metadata only — every data
movement is the builders' own Spark plans plus one expectations scan
per gated table; nothing here collects data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession

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

    def table(
        self,
        name: str,
        deps: tuple[str, ...] = (),
        expectations: Callable[[], dict[str, Column]] | None = None,
        on_violation: str = "fail",
        unique: tuple[tuple[str, ...], ...] = (),
    ):
        """Decorator registering a builder. ``expectations`` is a
        ZERO-ARG callable returning the rules dict (Column construction
        needs an active SparkSession, so rules must build lazily at run
        time, not at decoration time); ``unique`` lists key tuples that
        must be duplicate-free (audited like any rule; gate-only — a
        duplicate cannot be row-dropped, so it fails/warns but never
        participates in ``drop`` quarantining)."""
        if on_violation not in ("fail", "drop", "warn"):
            raise ValueError(
                f"on_violation must be fail|drop|warn, got {on_violation!r}"
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
            if name in self._tables:
                raise ValueError(f"table {name!r} already registered")
            self._tables[name] = _TableDef(
                name, fn, tuple(deps), expectations, on_violation,
                tuple(tuple(k) for k in unique),
            )
            return fn

        return deco

    def _order(self) -> list[_TableDef]:
        """Deterministic topological order (declaration order among
        ready nodes); raises on unknown or cyclic dependencies."""
        for t in self._tables.values():
            for d in t.deps:
                if d not in self._tables:
                    raise ValueError(
                        f"table {t.name!r} depends on unknown {d!r}"
                    )
        done: set[str] = set()
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

    def run(
        self,
        spark: SparkSession,
        root: str | None = None,
        stats_cols: dict[str, tuple[str, ...]] | None = None,
    ) -> RunResult:
        """Execute the DAG. With ``root``, each table publishes
        atomically to ``{root}/{name}`` as a TxnTable overwrite (crash
        = old snapshot survives) and downstream builders read the
        COMMITTED snapshot; without it, frames pass through in memory."""
        res = RunResult()
        blocked: set[str] = set()  # failed tables and their subtree
        for t in self._order():
            if any(d in blocked for d in t.deps):
                res.status[t.name] = "skipped"
                blocked.add(t.name)
                continue
            df = t.builder(
                spark, **{d: res.frames[d] for d in t.deps}
            )
            status = "published"
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
                        continue
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
                    tbl.overwrite(
                        df, stats_cols=(stats_cols or {}).get(t.name, ())
                    )
                    df = tbl.snapshot()
                    if t.name in res.quarantined:
                        # violations stay inspectable, not just counted
                        qt = TxnTable(spark, f"{root}/{t.name}__quarantine")
                        qt.overwrite(res.quarantined[t.name])
                        res.quarantined[t.name] = qt.snapshot()
                published = True
            finally:
                # root mode republishes from the committed snapshot, so
                # the builder cache can go; a FAILED gate's cache (the
                # `continue` path, published=False) goes too, as does a
                # cache orphaned by a raising builder/report/publish —
                # a crashed run never leaves frames pinned. Only the
                # SUCCESSFUL in-memory gated frame stays persisted:
                # unpersisting it would let downstream consumption
                # recompute the builder past the audit, the exact hole
                # the persist closes. (Long in-memory pipelines: use
                # root mode, or clearCache after run.)
                if cached is not None and (
                    root is not None or not published
                ):
                    cached.unpersist()
            res.frames[t.name] = df
            res.status[t.name] = status
        return res
