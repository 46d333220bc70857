"""Data-skipping index over parquet footers (operators/skipping.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators import maintenance as M
from kafka_map_reduce_spark.operators import skipping as SK


def _clustered_table(spark, path: str) -> None:
    (
        spark.range(8000)
        .select(F.col("id"), (F.col("id") % 400).alias("key"))
        .repartition(16)
        .write.mode("overwrite")
        .parquet(path)
    )
    M.cluster_parquet(
        spark, path, ["key"],
        target_file_bytes=M.parquet_file_stats(spark, path)["total_bytes"] // 8 + 1,
    )


def test_index_covers_all_files_and_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _clustered_table(spark, path)
    stats = SK.collect_file_stats(spark, path, ["key", "id"]).toPandas()
    n_files = M.parquet_file_stats(spark, path)["n_files"]
    assert set(stats["column"]) == {"key", "id"}
    assert len(stats) == 2 * n_files
    per_col = stats[stats["column"] == "id"]
    assert per_col["num_rows"].sum() == 8000
    assert per_col["min_val"].min() == 0 and per_col["max_val"].max() == 7999


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    _clustered_table(spark, path)
    n_files = M.parquet_file_stats(spark, path)["n_files"]
    assert n_files > 2
    pruned = SK.pruned_read(spark, path, "key", 10, 30)
    full = spark.read.parquet(path).filter(F.col("key").between(10, 30))
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
    # the clustered layout makes the index selective: most files skipped
    assert len(pruned.inputFiles()) < n_files / 2


def test_pruned_read_empty_range(spark, tmp_path):
    path = str(tmp_path / "t")
    _clustered_table(spark, path)
    assert SK.pruned_read(spark, path, "key", 10_000, 20_000).count() == 0
