"""Central query registry.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (runnable by DuckDB on the same parquet tables). The driver's
correctness gate compares the two at sf=0.01 — row count, schema, and an
order-insensitive value hash — so:

- every computed column is aliased identically in builder and oracle;
- every LIMIT query is fully deterministic (ORDER BY includes a unique
  tie-breaker key);
- floating-point aggregates are rounded identically on both sides so the
  hash does not depend on summation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None → driver records a weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    from . import load_all

    load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
