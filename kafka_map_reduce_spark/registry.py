"""Query registry: every declared capability of SURVEY.md §2 registers here.

Each query is a named callable ``(spark, sf_dir) -> DataFrame`` paired with
an optional DuckDB oracle SQL string (the driver's differential-correctness
contract — the Spark result and the oracle result are hash-compared at
sf=0.01). Queries without an oracle get a weaker rows-only check
(approximate/stateful/streaming operators).

This mirrors the reference's own correctness methodology — SQL audits over
the sink tables (/root/reference/README.md:86-113) — generalized into a
differential harness.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect: populate REGISTRY from every query module.
    import kafka_map_reduce_spark.queries  # noqa: F401

    return REGISTRY
