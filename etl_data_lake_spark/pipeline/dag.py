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
  leaves a half-table; downstream reads the committed snapshot), else
  stays in-memory for tests/composition;
* the returned report frame (one row per table × expectation, plus a
  ``status`` row per table) is the run's audit artifact.

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
    ):
        """Decorator registering a builder. ``expectations`` is a
        ZERO-ARG callable returning the rules dict (Column construction
        needs an active SparkSession, so rules must build lazily at run
        time, not at decoration time)."""
        if on_violation not in ("fail", "drop", "warn"):
            raise ValueError(
                f"on_violation must be fail|drop|warn, got {on_violation!r}"
            )
        if name in self._tables:
            raise ValueError(f"table {name!r} already registered")

        def deco(fn: Callable[..., DataFrame]):
            self._tables[name] = _TableDef(
                name, fn, tuple(deps), expectations, on_violation
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
        skipped_roots: set[str] = set()
        for t in self._order():
            if any(d in skipped_roots or res.status.get(d) == "failed"
                   for d in t.deps):
                res.status[t.name] = "skipped"
                skipped_roots.add(t.name)
                continue
            df = t.builder(
                spark, **{d: res.frames[d] for d in t.deps}
            )
            status = "published"
            if t.expectations is not None:
                rules = t.expectations()
                rep = expectations_report(df, rules).collect()
                res.audit += [
                    (t.name, r["rule"], r["n_rows"], r["n_violations"],
                     r["violation_frac"], r["passed"])
                    for r in rep
                ]
                dirty = any(not r["passed"] for r in rep)
                if dirty and t.on_violation == "fail":
                    res.status[t.name] = "failed"
                    skipped_roots.add(t.name)
                    continue
                if dirty and t.on_violation == "drop":
                    df, _bad = quarantine(df, rules)
                    status = "published_dropped_rows"
            if root is not None:
                from etl_data_lake_spark.sources.txn import TxnTable

                tbl = TxnTable(spark, f"{root}/{t.name}")
                tbl.overwrite(
                    df, stats_cols=(stats_cols or {}).get(t.name, ())
                )
                df = tbl.snapshot()
            res.frames[t.name] = df
            res.status[t.name] = status
        return res
