"""Named-query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB. The
driver's correctness gate runs both and compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically on both sides,
- float aggregates go through exact DECIMAL(38,6) summation then a final
  ``round`` so the two engines produce bit-identical doubles (SURVEY §7.4:
  float reduce-order nondeterminism),
- timestamps are emitted as formatted strings where precision could differ.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a Spark query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
