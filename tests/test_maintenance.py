"""Compaction / clustering maintenance operators (operators/maintenance.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators import maintenance as M


def _mk_table(spark, path: str, n_files: int = 40, rows: int = 4000) -> None:
    (
        spark.range(rows)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("key"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(n_files)  # simulate a streaming sink's tiny files
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compact_reduces_file_count_preserves_data(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    original = spark.read.parquet(path).collect()
    stats = M.compact_parquet(
        spark, path, target_file_bytes=stats_bytes(spark, path) // 4 + 1
    )
    assert stats["before"]["n_files"] == 40
    assert stats["after"]["n_files"] <= 4
    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, original))
    # no leftover temp/trash directories
    assert glob.glob(str(tmp_path / "t__*")) == []


def stats_bytes(spark, path: str) -> int:
    return M.parquet_file_stats(spark, path)["total_bytes"]


def test_compact_failed_publish_rolls_back(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _mk_table(spark, path, n_files=8, rows=500)
    original = sorted(map(tuple, spark.read.parquet(path).collect()))

    real_swap = M._swap

    def broken_swap(s, tmp, p):
        raise IOError("publish failed")

    monkeypatch.setattr(M, "_swap", broken_swap)
    try:
        M.compact_parquet(spark, path, target_file_bytes=1 << 30)
        raise AssertionError("expected IOError")
    except IOError:
        pass
    monkeypatch.setattr(M, "_swap", real_swap)
    # original table untouched by the failed rewrite
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == original


def test_cluster_parquet_produces_disjoint_key_ranges(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    stats = M.cluster_parquet(
        spark, path, ["key"], target_file_bytes=stats_bytes(spark, path) // 6 + 1
    )
    assert 1 < stats["after"]["n_files"] <= 6
    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("key")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(idx)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # range-partitioned files overlap at most at their boundary value, so a
    # key predicate prunes to ~one file via footer min/max alone
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo2 >= hi1 or lo2 == lo1
