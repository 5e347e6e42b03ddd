"""Vector math over ``array<float>`` embedding columns.

Everything is a higher-order-function expression (JVM-side, inside
whole-stage codegen) — no UDFs. Dot products are explicit LEFT FOLDS
in index order, which makes them bit-identical to the DuckDB oracle's
``list_reduce`` (verified: max |Δ| = 0.0 over the testdata corpus) —
a stronger guarantee than engine-builtin cosine functions give.

Scale: a 64-dim fold is ~64 codegen'd FMAs per row; for very wide
vectors (1k+ dims) switch to a Pandas UDF over Arrow batches (numpy
dot) — the multimodal module shows that pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] as a sequential left fold (deterministic order)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.size(a)),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(a, i) * F.element_at(b, i),
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---- DuckDB oracle twins (same fold order → same bits) -------------------

def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
