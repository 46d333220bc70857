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


def test_maintenance_cycle_end_to_end(spark, tmp_path):
    """Full table-maintenance lifecycle as ONE flow, the production
    cadence of a streaming lake: messy ingest -> index build -> streaming
    appends with incremental index maintenance (cost tracks the WRITE
    rate: only new files are footer-scanned) -> Z-order compaction (full
    rewrite; stale index rows drop, new files scan once) -> pruned reads
    that stay EXACT at every stage and, post-Z-order, actually skip files
    in BOTH independent dimensions."""
    path = str(tmp_path / "lake")
    # 1) messy ingest: 100k rows, two independent keys, 32 small files
    (
        spark.range(100_000)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("a"),
            ((F.col("id") * 7919) % 1000).alias("b"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path)
    )
    idx = SK.collect_file_stats(spark, path, ["a", "b"])
    n0 = M.parquet_file_stats(spark, path)["n_files"]
    assert idx.select("file").distinct().count() == n0

    def assert_exact(stats, lo, hi, col):
        pruned = SK.pruned_read(spark, path, col, lo, hi, stats=stats)
        full = spark.read.parquet(path).filter(F.col(col).between(lo, hi))
        got, want = pruned.count(), full.count()
        assert got == want and want > 0, f"{col}: pruned {got} != full {want}"
        return pruned

    # exact on the messy layout (likely zero skipping — still correct)
    assert_exact(idx, 100, 150, "a")

    # 2) streaming appends: two micro-batches; index maintenance must
    # footer-scan exactly the appended files, nothing else
    for batch, n_files in ((0, 3), (1, 2)):
        (
            spark.range(100_000 + batch * 5000, 100_000 + (batch + 1) * 5000)
            .select(
                F.col("id"),
                (F.col("id") % 1000).alias("a"),
                ((F.col("id") * 7919) % 1000).alias("b"),
            )
            .repartition(n_files)
            .write.mode("append")
            .parquet(path)
        )
        idx, n_new = SK.update_file_stats(spark, path, idx, ["a", "b"])
        assert n_new == n_files  # cost == write rate, not table size
    assert_exact(idx, 100, 150, "a")

    # 3) Z-order compaction: full rewrite into ~8 files clustered in BOTH
    # dims; the incremental update must drop every stale row and scan
    # only the rewritten files
    M.zorder_parquet(
        spark, path, ["a", "b"],
        target_file_bytes=M.parquet_file_stats(spark, path)["total_bytes"] // 8 + 1,
    )
    n_after = M.parquet_file_stats(spark, path)["n_files"]
    idx, n_new = SK.update_file_stats(spark, path, idx, ["a", "b"])
    assert n_new == n_after
    assert idx.select("file").distinct().count() == n_after
    scratch = SK.collect_file_stats(spark, path, ["a", "b"])
    assert sorted(map(tuple, idx.collect())) == sorted(map(tuple, scratch.collect()))

    # 4) post-compaction: pruned reads exact AND skipping in BOTH dims
    for col in ("a", "b"):
        pruned = assert_exact(idx, 100, 150, col)
        assert len(pruned.inputFiles()) < n_after, f"{col}: nothing skipped"
