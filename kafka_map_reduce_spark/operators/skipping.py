"""File-level data skipping from parquet footer statistics.

Partition pruning (q_scan_partitioned) only helps for the partition
columns; at 100 TB you also want to skip files by NON-partition columns —
what table formats call data skipping. After ``cluster_parquet``
(operators/maintenance.py) sorts a table by a key, each file covers a
narrow key range, and this module turns that into actual scan savings:

- ``collect_file_stats`` builds a skipping index: one row per (file,
  column) holding the footer min/max/null_count — read executor-side with
  pyarrow over the FILE LIST (a metadata-only pass; no data pages are
  touched, ~KBs per file regardless of file size).
- ``pruned_read`` consults the index and hands Spark only the files whose
  [min, max] overlaps the predicate range. The residual filter still runs
  (footer stats are a necessary, not sufficient, bound), so results are
  exactly those of a full scan + filter.

The index is itself a DataFrame — persist it as a parquet table and the
skipping decision for a 10M-file lake is one broadcast-size scan instead
of 10M footer reads per query.

Driver-memory discipline: every O(files) structure stays in a DataFrame.
The file listing is Spark's binaryFile source (not a Python list), index
diffs are anti-/semi-joins (not collected sets), and ``pruned_read`` only
materializes a path list on the driver when the index proves it is small
(≤ ``max_collect_files``); above that, pruning cannot pay for itself and
the read falls back to the ordinary single-root scan whose file handling
Spark already does natively.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_files_df(spark: SparkSession, path: str) -> DataFrame:
    """Data-file listing as a one-column DataFrame ``file: string``.

    Uses the binaryFile source with only the ``path`` column selected —
    Spark builds rows from file status alone and never opens the files.
    Hidden/commit files (``_SUCCESS``, dotfiles) are excluded by the file
    index; ``pathGlobFilter`` keeps only parquet data files."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(F.col("path").alias("file"))
    )


def _open_metadata(uri: str):
    """Parquet footer for ``uri`` via a pyarrow filesystem resolved from
    the URI scheme — file://, s3://, hdfs:// (hdfs needs libhdfs on the
    executors), or a bare local path."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    try:
        filesystem, p = pafs.FileSystem.from_uri(uri)
    except (ValueError, pafs.lib.ArrowInvalid):  # bare local path
        filesystem, p = pafs.LocalFileSystem(), uri
    with filesystem.open_input_file(p) as f:
        return pq.read_metadata(f)


def _stats_for_files(
    spark: SparkSession, files: DataFrame, columns: list[str]
) -> DataFrame:
    """Footer stats for every file in the ``files`` DataFrame (``file:
    string``), computed executor-side with mapInPandas."""
    cols = list(columns)

    def footer_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = _open_metadata(f)
                idx = {n: i for i, n in enumerate(md.schema.names)}
                for c in cols:
                    mins, maxs, nulls = [], [], 0
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is None or not st.has_min_max:
                            mins, maxs = None, None
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                        nulls += st.null_count or 0
                    rows.append(
                        {
                            "file": f,
                            "column": c,
                            "min_val": float(min(mins)) if mins else None,
                            "max_val": float(max(maxs)) if maxs else None,
                            "null_count": nulls,
                            "num_rows": md.num_rows,
                        }
                    )
            yield pd.DataFrame(rows)

    return (
        files.repartition(64)  # spread footer I/O; rows are tiny either way
        .mapInPandas(
            footer_stats,
            schema="file string, column string, min_val double, max_val double,"
            " null_count bigint, num_rows bigint",
        )
        # Materialize: an index is a STORED artifact (production: its own
        # parquet table). A lazy plan here would re-read footers on every
        # use — and break outright once compaction/Z-order replaces the
        # files it captured at build time.
        .localCheckpoint(eager=True)
    )


def collect_file_stats(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Skipping index for numeric ``columns``: (file, column, min_val,
    max_val, null_count, num_rows), one row per file x column, computed
    from parquet footers on the executors (mapInPandas over the file
    listing — scales to millions of files; no Python-side file list)."""
    return _stats_for_files(spark, _list_files_df(spark, path), columns)


def pruned_read(
    spark: SparkSession,
    path: str,
    column: str,
    lo: float,
    hi: float,
    stats: DataFrame | None = None,
    max_collect_files: int = 10_000,
) -> DataFrame:
    """Read only the files whose footer [min, max] for ``column`` overlaps
    [lo, hi], then apply the exact residual filter. Pass a precomputed
    ``stats`` index to skip the footer pass (the production shape: the
    index is maintained as its own table by the compaction job).

    The keep-list is materialized on the driver ONLY when the index proves
    it is at most ``max_collect_files`` paths (one small aggregate first).
    A larger keep-list means the predicate is barely selective — skipping
    would save little — so the read falls back to the ordinary full scan +
    filter, which is semantically identical and keeps both driver memory
    and plan size bounded regardless of table file count."""
    stats = stats if stats is not None else collect_file_stats(spark, path, [column])
    col_stats = stats.filter(F.col("column") == column)
    overlap = (F.col("max_val") >= lo) & (F.col("min_val") <= hi)
    counts = col_stats.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(overlap).alias("n_keep"),
    ).first()
    residual = F.col(column).between(lo, hi)
    schema = spark.read.parquet(path).schema
    if counts.n_keep == 0:
        return spark.createDataFrame([], schema).filter(residual)
    if counts.n_keep >= counts.n_total or counts.n_keep > max_collect_files:
        return spark.read.parquet(path).filter(residual)
    keep = [r.file for r in col_stats.filter(overlap).select("file").collect()]
    return spark.read.schema(schema).parquet(*keep).filter(residual)


def update_file_stats(
    spark: SparkSession, path: str, existing: DataFrame, columns: list[str]
) -> tuple[DataFrame, int]:
    """Incremental index maintenance: footer-scan ONLY files not yet in
    ``existing`` (and drop index rows for files that no longer exist, e.g.
    after compaction). Returns (fresh index, n_new_files). The production
    cadence: the streaming sink appends files continuously; the index job
    diffs the listing — a metadata-only anti-join, no collected path sets —
    so index maintenance cost tracks the WRITE rate, not the table size."""
    current = _list_files_df(spark, path)
    new_files = current.join(
        existing.select("file").distinct(), on="file", how="left_anti"
    )
    kept = existing.join(current, on="file", how="left_semi")
    n_new = new_files.count()
    if n_new == 0:
        return kept.localCheckpoint(eager=True), 0
    fresh = _stats_for_files(spark, new_files, columns)
    return kept.unionByName(fresh).localCheckpoint(eager=True), n_new
