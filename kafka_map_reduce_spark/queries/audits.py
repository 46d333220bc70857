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


@query(
    "q_sql_interface",
    oracle="""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("sql",),
)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL front door (TPC-H Q3 shape): tables registered as temp
    views, the whole query expressed in spark.sql — proving a user of the
    reference's SQL-on-the-sink workflow (README.md:86-113) can drive this
    engine with SQL alone, with Catalyst choosing the same broadcast-dim /
    shuffle-fact physical plan the DataFrame queries get. Revenue uses the
    compat decimal-sum recipe so the hash matches DuckDB bit-exactly."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"kmr_{t}")
    return spark.sql(
        """
        SELECT l_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
        FROM kmr_customer
        JOIN kmr_orders ON c_custkey = o_custkey
        JOIN kmr_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )
