"""The reference's own verification queries, as engine self-checks.

The reference proves delivery semantics with two ClickHouse SQL audits
(/root/reference/README.md:89-113, duplicated at main.rs:56-83):

1. delivery audit — per partition, (max(offset)-min(offset)+1) vs
   count(DISTINCT offset): delta 0 => no loss.
2. double-write audit — GROUP BY (partition, offset) HAVING count>1:
   rows => duplicates.

The synthetic ``events`` table plays the sink-table role with the mapping
partition := user_id, offset := event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table


def delivery_audit(df: DataFrame, part_col: str, off_col: str) -> DataFrame:
    """README.md:89-99 generalized: derived-table DISTINCT -> per-partition
    min/max/count -> arithmetic projections -> ORDER BY."""
    return (
        df.select(F.col(part_col).alias("partition"), F.col(off_col).alias("offset"))
        .distinct()
        .groupBy("partition")
        .agg(
            (F.max("offset") - F.min("offset") + F.lit(1)).alias("offset_diff"),
            F.count("offset").alias("occ"),
        )
        .withColumn("delta", F.col("offset_diff") - F.col("occ"))
        .orderBy("partition")
    )


def double_write_audit(df: DataFrame, part_col: str, off_col: str) -> DataFrame:
    """README.md:103-113: GROUP BY (partition, offset) HAVING count(*) > 1."""
    return (
        df.select(F.col(part_col).alias("partition"), F.col(off_col).alias("offset"))
        .groupBy("partition", "offset")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .orderBy("partition", "offset")
    )


@query(
    "q_audit_delivery",
    oracle="""
    SELECT "partition",
           (max("offset") - min("offset") + 1) AS offset_diff,
           count("offset") AS occ,
           (max("offset") - min("offset") + 1) - count("offset") AS delta
    FROM (SELECT DISTINCT user_id AS "partition", event_id AS "offset" FROM events)
    GROUP BY "partition"
    ORDER BY "partition"
    """,
    tags=("audit", "flagship"),
)
def q_audit_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's message-delivery audit (README.md:89-99)."""
    return delivery_audit(load_table(spark, sf_dir, "events"), "user_id", "event_id")


@query(
    "q_audit_double_write",
    oracle="""
    SELECT user_id AS "partition", event_id AS "offset", count(*) AS occ
    FROM (
        SELECT user_id, event_id FROM events
        UNION ALL
        SELECT user_id, event_id FROM events WHERE event_id % 10 = 0
    )
    GROUP BY "partition", "offset"
    HAVING count(*) > 1
    ORDER BY "partition", "offset"
    """,
    tags=("audit",),
)
def q_audit_double_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-write audit (README.md:103-113) over a stream with injected
    duplicates (every 10th record redelivered — the at-least-once scenario
    of SURVEY §1.3)."""
    ev = load_table(spark, sf_dir, "events")
    redelivered = ev.filter(F.col("event_id") % 10 == 0)
    return double_write_audit(ev.unionByName(redelivered), "user_id", "event_id")
