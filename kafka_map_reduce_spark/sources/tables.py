"""Batch sources: the driver-materialized parquet tables (TESTDATA.md).

At cluster scale these reads are plain columnar scans — projection and
predicate pushdown reach the parquet reader because every query builds on
the raw ``spark.read.parquet`` DataFrame (no caching/collect in between).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark's reader
    rejects that type, so it is read as raw nanos (legacy nanosAsLong conf)
    and converted to a microsecond TIMESTAMP_NTZ — the same value DuckDB
    sees after CAST(ts AS TIMESTAMP). Oracle SQL casts accordingly.
    """
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


class Tables:
    """Lazy per-table accessor: ``Tables(spark, sf_dir).lineitem`` etc."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLE_NAMES:
            raise AttributeError(f"unknown table {name!r}")
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]
