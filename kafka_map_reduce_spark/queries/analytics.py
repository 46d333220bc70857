"""Analytic query shapes a sink-side consumer runs on the reference's
tables (README.md:86-113 establishes SQL-on-the-sink as the product
surface): argmax/argmin aggregates, stratified sampling, and funnel
analysis over the event stream.

All three are single-digit-shuffle plans that survive a 100 TB scale-up:
argmax is one hash aggregate (partial+final, one row per group moves);
stratified sampling is one per-stratum rank window (and documents the
hash-threshold fallback for mega-strata); the funnel is three keyed
aggregations co-partitioned on ``user_id`` so consecutive stages reuse
the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_map_reduce_spark.functions import o_round4, round4
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table

# Orderkey fits well under 1e8 at every test SF, so (epoch * 1e8 + key) is a
# collision-free BIGINT ordering: argmax becomes deterministic under ties on
# the timestamp (ties resolve to the highest orderkey) — max_by/arg_max on a
# non-unique ordering value is engine- and partition-order-dependent.
_ARG_ORDER = "* 100000000 + o_orderkey"


@query(
    "q_agg_argmax",
    oracle=f"""
    SELECT o_orderpriority,
           max_by(o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) {_ARG_ORDER})
             AS latest_orderkey,
           min_by(o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) {_ARG_ORDER})
             AS earliest_orderkey,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregate (``max_by``/``min_by``): latest and earliest
    order per priority class. One hash aggregate — the partial aggregate
    carries a single (value, ordering) pair per group per partition, so the
    shuffle volume is O(groups x partitions) regardless of input size. The
    ordering value folds the unique key in as a tie-break (see _ARG_ORDER)
    to stay deterministic across engines and partition counts."""
    o = load_table(spark, sf_dir, "orders")
    order_val = F.unix_timestamp("o_orderdate") * 100000000 + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", order_val).alias("latest_orderkey"),
        F.min_by("o_orderkey", order_val).alias("earliest_orderkey"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "q_sample_stratified",
    oracle="""
    SELECT lang, doc_id, CAST(rn AS INTEGER) AS sample_rank
    FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS stratum_n
        FROM documents
    )
    WHERE rn <= ceil(stratum_n * 0.2)
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: exactly ceil(20%) of each
    language stratum, chosen by md5 rank so membership is reproducible
    across engines, runs, and repartitioning (the train/eval-split
    contract; complements q_sample_hash's global systematic sample).
    One shuffle on the stratum key. The rank window is exact-fraction;
    for mega-strata where a per-stratum sort is unwanted, the md5-prefix
    threshold of q_sample_hash applied per stratum is the approximate
    O(1)-state fallback."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    wc = Window.partitionBy("lang")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("stratum_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") <= F.ceil(F.col("stratum_n") * 0.2))
        .select("lang", "doc_id", F.col("rn").cast("int").alias("sample_rank"))
    )


@query(
    "q_doc_ids",
    oracle="""
    SELECT doc_id, lang,
           CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS row_id
    FROM documents
    """,
)
def q_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global sample ids ordered by doc_id WITHOUT a global sort:
    the two-phase range-partition + offset enumeration of
    operators/ids.py (RDD.zipWithIndex re-expressed declaratively). The
    oracle is the single-partition row_number the operator must equal —
    and must never be the plan at scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    from kafka_map_reduce_spark.operators.ids import contiguous_row_ids

    return contiguous_row_ids(docs, ["doc_id"])


@query(
    "q_funnel",
    oracle=f"""
    WITH v AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t2
        GROUP BY e.user_id
    )
    SELECT CAST(count(v.t1) AS BIGINT) AS users_view,
           CAST(count(c.t2) AS BIGINT) AS users_click,
           CAST(count(p.t3) AS BIGINT) AS users_purchase,
           {o_round4('CAST(count(p.t3) AS DOUBLE) / nullif(count(v.t1), 0)',
                     'conversion')}
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view -> click -> purchase) per user: each
    stage's entry time must follow the previous stage's.

    ONE scan of events and ONE wide shuffle: narrow (user_id, type, ts)
    rows hash-partition by user_id once, then three layered conditional
    window-mins (all the same partitioning — no extra exchange) derive
    t1 <= t2 <= t3 per user, a per-user groupBy reuses the partitioning,
    and only the final scalar rollup moves a second (single-row-per-
    partition) exchange. The previous join-of-three-aggregates shape
    planned 6 exchanges and FIVE scans of events because each aggregate
    subtree is duplicated across the final joins (Catalyst does no
    cross-branch common-subtree reuse) — this is the plan-audited
    replacement, budget-enforced at 2 exchanges in tools/plancheck.py."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("users_view"),
        F.count("t2").alias("users_click"),
        F.count("t3").alias("users_purchase"),
        round4(
            F.count("t3").cast("double") / F.nullif(F.count("t1"), F.lit(0))
        ).alias("conversion"),
    )
