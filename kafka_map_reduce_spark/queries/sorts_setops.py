"""Sort / limit / top-k / set operations (SURVEY §2.2).

Top-k compiles to TakeOrderedAndProject (per-partition heap + driver
merge) — no global sort at any scale. Full ORDER BY is a range-partitioned
sort (sampling-based bounds), the only operator here that moves all rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import Tables, load_table


@query(
    "q_orderby",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    """,
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (desc + asc)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT -> TakeOrderedAndProject (heap, not full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'signup'
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (no dedup, no shuffle)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    return ev.filter(F.col("event_type") == "purchase").unionByName(
        ev.filter(F.col("event_type") == "signup")
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup via hash aggregate)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
