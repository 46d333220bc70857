"""Aggregations (SURVEY §2.2): global/grouped/having/distinct/conditional,
rollup/cube/grouping sets, exact + approximate percentiles.

Spark executes these as partial (map-side) + final hash aggregates — the
shuffle moves only one row per (group, partition), which is the property
that makes a 100 TB GROUP BY feasible. Float aggregates use the
deterministic decimal-sum / floor-round helpers (functions/compat.py) so
value-hashes match DuckDB exactly regardless of partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.functions import davg4, dsum4, o_avg4, o_round4, o_sum4, round4
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table


@query(
    "q_agg_global",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           {o_sum4('l_quantity', 'sum_qty')},
           {o_avg4('l_extendedprice', 'avg_price')},
           {o_round4('min(l_discount)', 'min_disc')},
           {o_round4('max(l_tax)', 'max_tax')}
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped count/sum/avg/min/max (README.md:91-93 arithmetic)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum4(F.col("l_quantity")).alias("sum_qty"),
        davg4(F.col("l_extendedprice")).alias("avg_price"),
        round4(F.min("l_discount")).alias("min_disc"),
        round4(F.max("l_tax")).alias("max_tax"),
    )


@query(
    "q_agg_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_sum4('l_quantity', 'sum_qty')},
           {o_sum4('l_extendedprice', 'sum_base_price')},
           {o_sum4('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {o_sum4('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {o_avg4('l_quantity', 'avg_qty')},
           {o_avg4('l_extendedprice', 'avg_price')},
           {o_avg4('l_discount', 'avg_disc')},
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("flagship",),
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hash aggregate, TPC-H Q1 shape — the engine's flagship
    relational query (generalizes GROUP BY partition, README.md:97).

    Scan fanned out (r11): the bench lineitem is one unsplittable
    row group, so the decimal-heavy partial aggregate — virtually all
    of this query's work — ran on one task (2.372 -> 1.265 s fanned;
    decimal sums are exact, so the result is partition-invariant by
    arithmetic, not just by measurement); at corpus scale the gate is
    a no-op (splits >= slots) and the plan is unchanged."""
    from kafka_map_reduce_spark.sources import fan_out_scan

    li = fan_out_scan(
        load_table(spark, sf_dir, "lineitem"),
        key=("l_orderkey", "l_linenumber"),
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum4(F.col("l_quantity")).alias("sum_qty"),
            dsum4(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum4(disc_price).alias("sum_disc_price"),
            dsum4(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg4(F.col("l_quantity")).alias("avg_qty"),
            davg4(F.col("l_extendedprice")).alias("avg_price"),
            davg4(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_having",
    oracle=f"""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_cnt,
           {o_sum4('o_totalprice', 'total_spent')}
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 5
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (``HAVING occ > 1``, README.md:112)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum4(F.col("o_totalprice")).alias("total_spent"),
        )
        .filter(F.col("order_cnt") >= 5)
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT …) — expand-based distinct aggregation."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
    )


@query(
    "q_agg_countif",
    oracle=f"""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
           {o_sum4("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END", 'purchase_value')}
    FROM events GROUP BY user_id
    """,
)
def q_agg_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (count-if / sum-if)."""
    ev = load_table(spark, sf_dir, "events")
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    is_e = F.when(F.col("event_type") == "error", 1).otherwise(0)
    pv = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))
    return ev.groupBy("user_id").agg(
        F.sum(is_p).alias("purchases"),
        F.sum(is_e).alias("errors"),
        dsum4(pv).alias("purchase_value"),
    )


@query(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_sum4('l_quantity', 'sum_qty')},
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum4(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_sum4('l_quantity', 'sum_qty')},
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-dimensional grouping."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum4(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_sum4('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (SQL path through Catalyst)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("kmr_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty
        FROM kmr_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_approx_distinct",
    oracle=None,  # estimator-specific: HLL sketch differs from DuckDB's
    tags=("approx",),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the scale path for COUNT(DISTINCT)
    at 100 TB (sketch mergeable across partitions, no expand)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
    )


@query(
    "q_hll_sketches",
    oracle=None,  # approximate: Apache DataSketches HLL, engine-specific
    tags=("approx",),
)
def q_hll_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus statistics from the persistable HLL sketch
    table (operators/sketches.py): ONE scan per table sketches every
    audited column (each hll_sketch_agg its own mergeable partial
    accumulator), then estimation reads the KB-sized sketch rows — the
    append-only shape where per-ingest-batch sketch rows accumulate and
    distinct-counts union them WITHOUT rescanning the corpus. Rows-only
    by declaration (HLL estimates are sketch-implementation-specific;
    <=5% error vs exact and append==full-scan merge semantics are pinned
    in tests/test_hll_sketches.py)."""
    from kafka_map_reduce_spark.operators.sketches import (
        hll_column_sketches,
        hll_estimates,
    )

    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    sketches = hll_column_sketches(
        docs, ["doc_id", "lang", "source"]
    ).unionByName(hll_column_sketches(events, ["user_id", "event_type"]))
    return hll_estimates(sketches).orderBy("column")


@query(
    "q_agg_percentile",
    oracle=f"""
    SELECT l_returnflag,
           {o_round4('quantile_cont(l_quantity, 0.5)', 'p50_qty')},
           {o_round4('quantile_cont(l_extendedprice, 0.9)', 'p90_price')}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (sort-based within group).

    fan_out_scan (r12, queued from the r11 A/B at 0.90): percentile's
    partial-aggregate buffers are per-group value lists built on the
    map side — a single-row-group scan builds them all on one core.
    Group-invariant, so fanning the scan is output-identical."""
    from kafka_map_reduce_spark.sources import fan_out_scan

    return (
        fan_out_scan(
            load_table(spark, sf_dir, "lineitem"),
            key=("l_orderkey", "l_linenumber"),
        )
        .groupBy("l_returnflag")
        .agg(
            round4(F.percentile("l_quantity", F.lit(0.5))).alias("p50_qty"),
            round4(F.percentile("l_extendedprice", F.lit(0.9))).alias("p90_price"),
        )
    )


@query(
    "q_sketch_quantile",
    oracle=None,  # approximate: Greenwald-Khanna sketch, engine-specific
    tags=("approx",),
)
def q_sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (GK sketch) — mergeable, single-pass; the
    100 TB replacement for exact percentile (EDBT'23 sketch pattern)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile_approx("l_quantity", F.lit(0.5), F.lit(1000)), 4).alias(
                "p50_qty_approx"
            ),
            F.round(
                F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(1000)), 4
            ).alias("p90_price_approx"),
        )
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_ids,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set, emitted as sorted comma-joined strings:
    the driver canonicalizer can't sort/hash array cells, so driver-checked
    queries emit only scalar columns (arrays sorted numerically BEFORE
    stringification so both engines join in the same order)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("order_ids"),
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
        )
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(CAST(c_custkey AS VARCHAR), ','
                      ORDER BY CAST(c_custkey AS VARCHAR)) AS members
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (sorted concat of group members)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.col("c_custkey").cast("string")))
            ).alias("members")
        )
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           floor((sqrt((CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                        - CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                          * CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*))
                       / (count(*) - 1))) * 10000 + 0.5) / 10000 AS qty_stddev,
           floor(((CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   - CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                     * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*))
                  / (count(*) - 1)) * 10000 + 0.5) / 10000 AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev, covariance) computed from exact
    DECIMAL power sums instead of the engines' native one-pass estimators:
    native stddev/covar accumulate doubles in partition order, so their
    last ulps are nondeterministic across engines AND across cluster runs
    — the decimal-sum formulation is associative, hash-stable, and the
    right construction at 1000-executor scale."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sum_q = F.sum(q.cast("decimal(18,6)")).cast("double")
    sum_q2 = F.sum((q * q).cast("decimal(18,6)")).cast("double")
    sum_qp = F.sum((q * p).cast("decimal(18,6)")).cast("double")
    sum_p = F.sum(p.cast("decimal(18,6)")).cast("double")
    return li.groupBy("l_returnflag").agg(
        round4(F.sqrt((sum_q2 - sum_q * sum_q / n) / (n - 1))).alias("qty_stddev"),
        round4(((sum_qp - sum_q * sum_p / n) / (n - 1))).alias("qty_price_covar"),
    )


@query(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based systematic sampling (~2/16 of rows): the
    training-pipeline sampling primitive that is reproducible across
    engines, runs, and cluster sizes — unlike RNG-based sample(), the
    same row always lands in the same split, so train/eval membership is
    stable under re-partitioning. Stratified variants apply the same
    predicate with per-stratum thresholds."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_custkey", "o_orderstatus")
