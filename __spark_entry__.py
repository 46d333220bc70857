"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's delivery audit,
/root/reference/README.md:89-99) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2; ``oracle_sql()`` the matching
DuckDB SQL (omitted for approximate / non-SQL-expressible operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kafka_map_reduce_spark.registry import all_queries

    return all_queries()["q_audit_delivery"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kafka_map_reduce_spark.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    from kafka_map_reduce_spark.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
