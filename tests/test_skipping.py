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


def _xy_table(spark, path: str) -> None:
    # two independent uniform dimensions (id decomposed as a 100x100 grid,
    # shuffled so the input order correlates with neither)
    (
        spark.range(10000)
        .select(
            (F.col("id") % 100).alias("x"),
            (F.col("id") / 100).cast("long").alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .orderBy(F.md5(F.col("id").cast("string")))
        .repartition(16)
        .write.mode("overwrite")
        .parquet(path)
    )


def _avg_span(stats_pdf, column: str, global_span: float) -> float:
    per = stats_pdf[stats_pdf["column"] == column]
    return float((per["max_val"] - per["min_val"]).mean()) / global_span


def test_zorder_is_selective_in_both_dims(spark, tmp_path):
    from kafka_map_reduce_spark.operators import maintenance as M2

    lex, zed = str(tmp_path / "lex"), str(tmp_path / "zed")
    _xy_table(spark, lex)
    _xy_table(spark, zed)
    tfb = M2.parquet_file_stats(spark, lex)["total_bytes"] // 16 + 1
    M2.cluster_parquet(spark, lex, ["x", "y"], target_file_bytes=tfb)
    M2.zorder_parquet(spark, zed, ["x", "y"], target_file_bytes=tfb)

    lex_stats = SK.collect_file_stats(spark, lex, ["x", "y"]).toPandas()
    zed_stats = SK.collect_file_stats(spark, zed, ["x", "y"]).toPandas()

    # lexicographic: leading key selective, trailing key useless (~full span)
    assert _avg_span(lex_stats, "x", 99.0) < 0.35
    assert _avg_span(lex_stats, "y", 99.0) > 0.6
    # z-order: BOTH dimensions selective
    assert _avg_span(zed_stats, "x", 99.0) < 0.5
    assert _avg_span(zed_stats, "y", 99.0) < 0.5

    # and the rewrite preserved the data exactly
    a = spark.read.parquet(lex).selectExpr("x", "y", "payload")
    b = spark.read.parquet(zed).selectExpr("x", "y", "payload")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_pruned_read_matches_full_scan(spark, tmp_path):
    from kafka_map_reduce_spark.operators import maintenance as M2

    path = str(tmp_path / "z")
    _xy_table(spark, path)
    M2.zorder_parquet(
        spark, path, ["x", "y"],
        target_file_bytes=M2.parquet_file_stats(spark, path)["total_bytes"] // 16 + 1,
    )
    n_files = M2.parquet_file_stats(spark, path)["n_files"]
    for col in ("x", "y"):
        pruned = SK.pruned_read(spark, path, col, 5, 15)
        full = spark.read.parquet(path).filter(F.col(col).between(5, 15))
        assert pruned.count() == full.count() == 1100
        assert len(pruned.inputFiles()) < n_files


def test_incremental_index_update(spark, tmp_path):
    path = str(tmp_path / "t")
    _clustered_table(spark, path)
    idx = SK.collect_file_stats(spark, path, ["key"])
    n0 = M.parquet_file_stats(spark, path)["n_files"]

    # append two new files (a streaming sink's next micro-batches)
    (
        spark.range(8000, 9000)
        .select(F.col("id"), (F.col("id") % 400).alias("key"))
        .repartition(2)
        .write.mode("append")
        .parquet(path)
    )
    idx2, n_new = SK.update_file_stats(spark, path, idx, ["key"])
    assert n_new == 2
    assert idx2.select("file").distinct().count() == n0 + 2
    # incremental == from-scratch
    full = SK.collect_file_stats(spark, path, ["key"])
    assert sorted(map(tuple, idx2.collect())) == sorted(map(tuple, full.collect()))

    # no change -> no new footer reads
    idx3, n_new3 = SK.update_file_stats(spark, path, idx2, ["key"])
    assert n_new3 == 0 and idx3.count() == idx2.count()

    # compaction replaces every file; stale index rows must drop
    M.compact_parquet(spark, path, target_file_bytes=1 << 30)
    idx4, n_new4 = SK.update_file_stats(spark, path, idx2, ["key"])
    full4 = SK.collect_file_stats(spark, path, ["key"])
    assert n_new4 == M.parquet_file_stats(spark, path)["n_files"]
    assert sorted(map(tuple, idx4.collect())) == sorted(map(tuple, full4.collect()))
