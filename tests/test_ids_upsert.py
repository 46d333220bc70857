"""Contiguous id assignment (operators/ids.py) and keyed parquet upsert
(operators/maintenance.py merge_upsert_parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators import maintenance as M
from kafka_map_reduce_spark.operators.ids import contiguous_row_ids, running_total


class TestContiguousRowIds:
    def test_matches_global_row_number(self, spark):
        # shuffled input so physical order correlates with nothing
        df = (
            spark.range(5000)
            .select(
                F.col("id"),
                F.md5(F.col("id").cast("string")).alias("k"),
            )
            .orderBy("k")
            .repartition(16)
        )
        got = contiguous_row_ids(df, ["id"]).select("id", "row_id").collect()
        assert sorted((r.id, r.row_id) for r in got) == [
            (i, i + 1) for i in range(5000)
        ]

    def test_ids_are_dense_and_start_at_one(self, spark):
        df = spark.range(997).select((F.col("id") * 3).alias("v"))
        ids = sorted(
            r.row_id for r in contiguous_row_ids(df, ["v"]).collect()
        )
        assert ids == list(range(1, 998))

    def test_property_random_values(self, spark):
        """Property: for arbitrary (possibly negative / clustered) unique
        keys, ids equal the argsort rank + 1. Single example set chosen by
        hypothesis-style generation is overkill for a Spark round-trip, so
        we use fixed seeds over three adversarial shapes."""
        import random

        for seed, n in [(1, 257), (2, 1024), (3, 63)]:
            rng = random.Random(seed)
            vals = rng.sample(range(-(10**9), 10**9), n)
            df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(7)
            got = {r.v: r.row_id for r in contiguous_row_ids(df, ["v"]).collect()}
            expect = {v: i + 1 for i, v in enumerate(sorted(vals))}
            assert got == expect, f"seed={seed}"

    def test_compound_order_key(self, spark):
        df = spark.range(2000).select(
            (F.col("id") % 7).alias("grp"), F.col("id")
        )
        got = contiguous_row_ids(df, ["grp", "id"]).collect()
        expect = sorted(((r.grp, r.id) for r in got))
        by_id = {(r.grp, r.id): r.row_id for r in got}
        assert [by_id[k] for k in expect] == list(range(1, 2001))


class TestRunningTotal:
    def test_matches_global_window(self, spark):
        # shuffled, multi-partition input; exclusive prefix sum must equal
        # the single-reducer SUM() OVER (ORDER BY k ROWS ... 1 PRECEDING)
        df = (
            spark.range(3000)
            .select(
                F.col("id").alias("k"),
                ((F.col("id") * 37) % 101).alias("w"),
            )
            .orderBy(F.md5(F.col("k").cast("string")))
            .repartition(16)
        )
        got = {
            r.k: r.cum_before
            for r in running_total(df, ["k"], "w").collect()
        }
        acc, expect = 0, {}
        for k in range(3000):
            expect[k] = acc
            acc += (k * 37) % 101
        assert got == expect

    def test_zero_and_negative_weights(self, spark):
        rows = [(0, 5), (1, 0), (2, -3), (3, 0), (4, 7)]
        df = spark.createDataFrame(rows, "k long, w long").repartition(3)
        got = {
            r.k: r.cum_before
            for r in running_total(df, ["k"], "w").collect()
        }
        assert got == {0: 0, 1: 5, 2: 5, 3: 2, 4: 2}

    def test_single_partition_input(self, spark):
        df = spark.createDataFrame([(i, 1) for i in range(10)], "k long, w long")
        df = df.coalesce(1)
        got = {r.k: r.cum_before for r in running_total(df, ["k"], "w").collect()}
        assert got == {i: i for i in range(10)}


class TestMergeUpsert:
    def _base(self, spark, path):
        spark.createDataFrame(
            [(i, f"v{i}", "base") for i in range(100)],
            "k long, payload string, src string",
        ).repartition(4).write.mode("overwrite").parquet(path)

    def test_replace_and_append(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._base(spark, path)
        updates = spark.createDataFrame(
            [(7, "NEW7", "upd"), (42, "NEW42", "upd"), (100, "NEW100", "upd")],
            "k long, payload string, src string",
        )
        info = M.merge_upsert_parquet(spark, path, updates, ["k"])
        assert info["n_rows"] == 101  # 100 base - 2 replaced + 3 updates
        out = {r.k: (r.payload, r.src) for r in spark.read.parquet(path).collect()}
        assert out[7] == ("NEW7", "upd")
        assert out[42] == ("NEW42", "upd")
        assert out[100] == ("NEW100", "upd")
        assert out[8] == ("v8", "base")

    def test_duplicate_update_keys_rejected(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._base(spark, path)
        dup = spark.createDataFrame(
            [(1, "a", "u"), (1, "b", "u")], "k long, payload string, src string"
        )
        with pytest.raises(ValueError, match="duplicate keys"):
            M.merge_upsert_parquet(spark, path, dup, ["k"])
        # base untouched by the failed merge
        assert spark.read.parquet(path).count() == 100

    def test_idempotent_reapply(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._base(spark, path)
        updates = spark.createDataFrame(
            [(5, "X", "u")], "k long, payload string, src string"
        )
        M.merge_upsert_parquet(spark, path, updates, ["k"])
        M.merge_upsert_parquet(spark, path, updates, ["k"])
        out = spark.read.parquet(path)
        assert out.count() == 100
        assert out.filter("k = 5").first().payload == "X"


def test_grouped_running_total_matches_naive_window(spark):
    """Per-group exclusive prefix sums == the single-reducer
    sum() OVER (PARTITION BY g ORDER BY k) they replace, including a hot
    group large enough to span several range partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark.operators.ids import grouped_running_total

    rows = [("hot", i, (i * 7) % 13 + 1) for i in range(5000)]
    rows += [("cold_a", i, i % 5 + 1) for i in range(40)]
    rows += [("cold_b", i, 3) for i in range(7)]
    df = spark.createDataFrame(rows, "g string, k long, w long").repartition(16)
    got = grouped_running_total(df, ["g"], ["k"], "w", "cum")
    naive = df.withColumn(
        "cum",
        F.coalesce(
            F.sum("w").over(
                Window.partitionBy("g")
                .orderBy("k")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    assert (
        got.select("g", "k", "cum")
        .exceptAll(naive.select("g", "k", "cum"))
        .count()
        == 0
    )
    assert got.count() == naive.count()
