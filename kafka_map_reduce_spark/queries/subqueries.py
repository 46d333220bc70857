"""Subqueries (SURVEY §2.2 origin: the audits' derived-table subquery,
README.md:89-99): scalar subquery in predicate, IN-subquery, correlated
scalar subquery — the shapes Catalyst decorrelates into joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.functions import o_round4
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import Tables, load_table


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_above_avg
    FROM lineitem
    WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (one extra aggregate
    job; the scalar is broadcast into the scan filter)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("kmr_lineitem_sq")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_above_avg
        FROM kmr_lineitem_sq
        WHERE l_quantity > (SELECT avg(l_quantity) FROM kmr_lineitem_sq)
        GROUP BY l_returnflag
        """
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelates to a left-semi join)."""
    t = Tables(spark, sf_dir)
    rich = t.customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return t.orders.join(
        rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "q_subquery_correlated",
    oracle=f"""
    SELECT o.o_orderkey,
           {o_round4('o.o_totalprice', 'o_totalprice')}
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT 2 * avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join on the correlation key)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("kmr_orders_sq")
    return spark.sql(
        """
        SELECT o.o_orderkey,
               floor(o.o_totalprice * 10000 + 0.5) / 10000 AS o_totalprice
        FROM kmr_orders_sq o
        WHERE o.o_totalprice > (
            SELECT 2 * avg(o2.o_totalprice) FROM kmr_orders_sq o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )
