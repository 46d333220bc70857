"""Streaming window algebra, batch-replay mode (SURVEY §2.2 q_stream_*).

The reference's reduce stage batches by size+time (flush_interval,
lib.rs:786-792); generalized here to event-time windowing. These queries
run the SAME window expressions Structured Streaming uses — the batch
replay is the oracle-checkable face of the streaming pipeline
(kafka_map_reduce_spark/streaming runs them unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.functions import dsum4, o_sum4
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table


@query(
    "q_stream_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           CAST(count(*) AS BIGINT) AS cnt,
           {o_sum4('value', 'total_value')}
    FROM events
    GROUP BY 1
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed event-time windows (time-bucketed reduce flush)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum4(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "total_value")
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
             - to_hours(k.k) AS window_start,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
    GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping windows (2h size, 1h slide): each event lands in 2
    windows; Spark's window() expands them natively."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


@query(
    "q_stream_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL 30 MINUTE
                         OR lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS cnt
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min inactivity) — the oracle is the
    classic gaps-and-islands rewrite."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("user_id", F.col("w.start").alias("session_start"), "cnt")
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the record key — the *preventive* form of the
    double-write audit (README.md:103-113): a redelivered stream (every
    10th record duplicated) deduped back to exactly the original."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    redelivered = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return redelivered.dropDuplicates(["event_id"])
