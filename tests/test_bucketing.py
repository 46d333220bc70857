"""Bucketed-table co-located joins (operators/bucketing.py): the join on
the bucket key must plan with NO shuffle exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators import bucketing as B


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_test")
    orders = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("status")
    )
    items = spark.range(6000).select(
        (F.col("id") % 2000).alias("k"), (F.col("id") % 13).alias("qty")
    )
    B.write_bucketed(orders, "buckets_test.o", ["k"], 8)
    B.write_bucketed(items, "buckets_test.li", ["k"], 8)
    yield "buckets_test.o", "buckets_test.li"
    spark.sql("DROP TABLE IF EXISTS buckets_test.o")
    spark.sql("DROP TABLE IF EXISTS buckets_test.li")
    spark.sql("DROP DATABASE IF EXISTS buckets_test")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    o, li = bucketed_pair
    with _no_broadcast(spark):
        df = B.bucketed_join(spark, o, li, ["k"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert df.count() == 6000


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    o, _ = bucketed_pair
    df = spark.table(o).groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() == 2000


def test_mismatched_buckets_still_correct(spark, bucketed_pair):
    o, li = bucketed_pair
    df = B.bucketed_join(spark, o, li, ["k"])
    rows = df.groupBy().agg(F.sum("qty").alias("s")).collect()
    expected = sum(i % 13 for i in range(6000))
    assert rows[0].s == expected


class _no_broadcast:
    """Temporarily disable broadcast joins so the colocated SMJ is chosen."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_force_sort_merge_needs_no_conf_mutation(spark, bucketed_pair):
    """The merge hint pins the co-located SMJ even when the small side
    would broadcast under the default threshold — the conf-free form the
    registered q_join_bucketed uses (a broadcast would also show zero
    shuffle Exchanges but would prove nothing about the bucket layout)."""
    o, li = bucketed_pair
    df = B.bucketed_join(spark, o, li, ["k"], force_sort_merge=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert df.count() == 6000
