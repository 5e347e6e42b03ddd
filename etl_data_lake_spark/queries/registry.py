"""Query catalog registry — the driver-facing contract.

Every operator from SURVEY.md §2 (and every extension operator) is
registered here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet.

Parity rules (enforced by tests/test_parity.py, mirrored from the
driver's compare):
* every computed column aliased identically on both sides;
* integer-typed computed columns cast to long/BIGINT on both sides;
* aggregated doubles go through functions.money (exact-integer sums);
* timestamps returned at second granularity (events.ts is parquet
  TIMESTAMP(NANOS); Spark truncates to micros on read);
* every LIMIT carries a total order (unique tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    from etl_data_lake_spark.queries import (  # noqa: F401
        advanced_rel,
        curation,
        dedup_queries,
        golden,
        multimodal_queries,
        relational,
        streaming_queries,
        text_queries,
        vector_queries,
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}
