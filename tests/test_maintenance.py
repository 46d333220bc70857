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


def test_compact_recovers_from_stale_trash_dir(spark, tmp_path):
    """A crash between the two publish renames leaves a ``__old`` trash
    dir; the next compaction must treat it as committed garbage and
    succeed (it used to fail the first rename forever)."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, n_files=8, rows=500)
    original = sorted(map(tuple, spark.read.parquet(path).collect()))
    stale = tmp_path / "t__old"
    stale.mkdir()
    (stale / "junk.parquet").write_bytes(b"not parquet")
    M.compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == original
    assert glob.glob(str(tmp_path / "t__*")) == []


def test_merge_upsert_then_compact_roundtrip(spark, tmp_path):
    """Upsert + compaction compose: the ReplacingMergeTree-style merge
    followed by the merge-tree-style rewrite leaves exactly the merged
    rows in few files."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, n_files=16, rows=1000)
    updates = spark.range(990, 1010).select(
        F.col("id"),
        (F.col("id") % 97).alias("key"),
        F.lit("updated").alias("payload"),
    )
    M.merge_upsert_parquet(spark, path, updates, ["id"])
    M.compact_parquet(spark, path, target_file_bytes=1 << 30)
    out = spark.read.parquet(path)
    assert out.count() == 1010
    assert out.filter("payload = 'updated'").count() == 20
    assert M.parquet_file_stats(spark, path)["n_files"] == 1


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
