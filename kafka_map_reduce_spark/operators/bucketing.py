"""Bucketed tables: shuffle-free fact-to-fact equi-joins.

The single most expensive physical step in a 100 TB fact-fact join is the
shuffle that hash-partitions both sides on the join key. Bucketing
pre-pays it once at write time: both tables are written hash-partitioned
into the SAME number of buckets on the join key (plus sorted within each
bucket), so every subsequent join/aggregation on that key is exchange-free
— Spark's EnsureRequirements recognizes the bucket spec as a satisfying
HashPartitioning and plans a SortMergeJoin with NO Exchange on either
side. For a table joined repeatedly (the fact-table norm), this converts
a per-query shuffle into a one-time layout cost.

Requires ``saveAsTable`` (bucket metadata lives in the catalog; plain
``.parquet(path)`` writes cannot carry it). Matching bucket counts on both
sides; a mismatch silently falls back to shuffling the smaller side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.
    Sorting within buckets lets the join skip its per-task sort too
    (SortMergeJoin reads pre-sorted runs) and tightens parquet row-group
    min/max bounds on the key."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucket-spec tables on their bucket key. The plan must
    contain no Exchange under the join (tests assert this).
    ``force_sort_merge`` adds the merge hint so the strategy choice can't
    fall back to broadcast when one side is tiny — it pins the join to
    the co-located SortMergeJoin the bucket layout exists for, without
    mutating any session conf (a broadcast would also be exchange-"free"
    but would prove nothing about the layout)."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
