"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join split (on in session.py) handles most skew at runtime
by splitting oversized partitions. These operators are the EXPLICIT
fallback for the cases AQE can't fix: a single key so hot that one
reducer drowns (aggregation skew isn't AQE-splittable when the final
agg needs the whole key), or a broadcast-ineligible dimension with a
power-law fact side.

* ``salted_join``: fact rows get a deterministic salt in [0, S);
  the dim side is replicated S times; the join key becomes
  (key, salt) — the hot key's rows spread over S reducers at the cost
  of an S-times-larger build side. Use when dim_size × S still fits
  comfortably in executor memory.
* ``two_phase_agg_count``: count per key as partial counts per
  (key, salt) then a final S-row-per-key combine — the hot key's
  traffic is S partial rows instead of all its raw rows. (Spark's
  partial aggregation already does this for algebraic aggregates;
  the explicit form exists for pipelines that need the intermediate,
  e.g. sketch merges.)

Salts are ``pmod(xxhash64(row, monotonically_increasing_id), S)``: the
row-content hash alone would send EXACT-DUPLICATE rows of a hot key to
one salt value — the one skew shape the operator exists to fix — so a
physical per-row component (partition id in the high bits, row
position in the low) is mixed in. Fact-side salt need not be
reproducible across runs; it only has to spread rows within this job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, salts: int) -> F.Column:
    return F.pmod(
        F.xxhash64(
            *[F.col(c) for c in df.columns],
            F.monotonically_increasing_id(),
        ),
        F.lit(salts),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON fact[on] == dim[on]`` with the fact's
    hot keys spread across ``salts`` reducers."""
    salted_fact = fact.withColumn("__salt", _salt(fact, salts))
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )
    return salted_fact.join(exploded_dim, [on, "__salt"], how).drop("__salt")


def two_phase_agg_count(df: DataFrame, key: str, salts: int = 8) -> DataFrame:
    """→ (key, n) via per-(key, salt) partials then a final combine."""
    partial = (
        df.withColumn("__salt", _salt(df, salts))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").cast("long").alias("n"))
