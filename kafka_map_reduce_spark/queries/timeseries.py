"""Time-series queries (Tier C): regular-grid resampling with forward
fill, and value histograms — the hypertable-rollup-flavored operations a
training-data pipeline runs over event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.functions import round4
from kafka_map_reduce_spark.operators import asof_join
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table


@query(
    "q_timeseries_gapfill",
    oracle="""
    WITH ev AS (SELECT user_id, ts, max(value) AS value
                FROM events GROUP BY user_id, ts),
    b AS (SELECT date_trunc('hour', min(ts)) AS t0,
                 date_trunc('hour', max(ts)) AS t1 FROM events),
    u AS (SELECT DISTINCT user_id FROM events),
    grid AS (
        SELECT u.user_id,
               unnest(generate_series(b.t0, b.t1, INTERVAL 1 HOUR)) AS hour
        FROM u CROSS JOIN b
    )
    SELECT grid.user_id, strftime(grid.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           floor(ev.value * 10000 + 0.5) / 10000 AS last_value
    FROM grid ASOF LEFT JOIN ev
      ON grid.user_id = ev.user_id AND grid.hour >= ev.ts
    """,
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto a regular hourly grid with
    forward fill (last value at-or-before each grid point): generate the
    grid (users x sequence of hours — the bounds row is a 1-row broadcast),
    then the as-of join operator carries the fill in ONE keyed window —
    never a range join. Hours before a user's first event stay NULL.
    Grid size = users x span-hours, independent of event count.

    Four exchanges by design, but only ONE moves O(rows): the (user, ts)
    dedup aggregate ships post-partial rows, distinct-users ships
    O(users x partitions), the bounds rollup ships one row per partition,
    and the as-of window shuffles the grid∪events union (the intrinsic
    cost of the fill). users/bounds read the RAW scan, not the deduped
    branch — (user, ts) dedup changes neither the user set nor the ts
    bounds, and deriving them upstream keeps the expensive dedup subtree
    out of the duplicated branches (Catalyst does no cross-branch
    common-subtree reuse; a pre-shuffle repartition("user_id") was tried
    and is WORSE — it turns every branch's map-side partial aggregation
    into a full-row O(events) shuffle)."""
    raw = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # deduplicate (user, ts) identically to the oracle: as-of fill needs a
    # unique right side for deterministic tie-breaks
    ev = raw.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    bounds = raw.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    users = raw.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    filled = asof_join(
        grid, ev, on=["user_id"], left_ts="hour", right_ts="ts", right_cols=["value"]
    )
    return filled.select(
        "user_id",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        round4(F.col("r_value")).alias("last_value"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS cnt,
           floor(min(value) * 10000 + 0.5) / 10000 AS bin_min,
           floor(max(value) * 10000 + 0.5) / 10000 AS bin_max
    FROM events GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (distribution analysis over a corpus
    column): one hash aggregate on the bin key — the shape that scales to
    any row count because bins, not rows, cross the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            round4(F.min("value")).alias("bin_min"),
            round4(F.max("value")).alias("bin_max"),
        )
    )
