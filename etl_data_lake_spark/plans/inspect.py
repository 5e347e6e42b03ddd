"""Executed-plan introspection helpers.

The scale rules this repo claims (broadcast the dims, push the
filters, prune the columns, no gratuitous Exchange) are CHECKED, not
assumed: tests and audits call these helpers against the actual
physical plan. ``explain_report`` is the one-stop summary —
join strategies, exchange count, scan pushdowns, codegen presence —
cheap enough to assert on in CI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_string(df: DataFrame, mode: str = "executed") -> str:
    qe = df._jdf.queryExecution()
    if mode == "executed":
        return qe.executedPlan().toString()
    if mode == "formatted":
        jvm = df.sparkSession._jvm
        return qe.explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    raise ValueError(mode)


@dataclass
class PlanReport:
    joins: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    scan_schemas: list[str] = field(default_factory=list)
    has_codegen: bool = False
    text: str = ""


def explain_report(df: DataFrame) -> PlanReport:
    text = plan_string(df, "formatted")
    return PlanReport(
        joins=re.findall("|".join(_JOIN_KINDS), text),
        n_exchanges=len(re.findall(r"\bExchange\b", text)),
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", text) if m
        ],
        scan_schemas=re.findall(r"ReadSchema: (\S+)", text),
        has_codegen="WholeStageCodegen" in text or re.search(r"^\*", text, re.M)
        is not None,
        text=text,
    )


def assert_broadcast_join(df: DataFrame) -> None:
    """Every join in the plan uses a broadcast strategy (what a
    dim-join query should look like — no shuffle of the fact side)."""
    rep = explain_report(df)
    bad = [j for j in rep.joins if not j.startswith("Broadcast")]
    assert rep.joins and not bad, f"non-broadcast joins {bad} in:\n{rep.text}"


def assert_no_exchange(df: DataFrame) -> None:
    """The plan moves no data between stages (bucketed/co-partitioned
    reads, narrow transforms)."""
    rep = explain_report(df)
    assert rep.n_exchanges == 0, f"plan shuffles:\n{rep.text}"
