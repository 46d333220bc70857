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
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.maintenance import _fs_for


def _list_files(spark: SparkSession, path: str) -> list[str]:
    fs, hpath, _ = _fs_for(spark, path)
    it = fs.listFiles(hpath, True)
    out = []
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append(f.getPath().toString())
    return out


def _stats_for_files(
    spark: SparkSession, files: list[str], columns: list[str]
) -> DataFrame:
    cols = list(columns)

    def footer_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                local = f[len("file:"):] if f.startswith("file:") else f
                md = pq.read_metadata(local)
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
        spark.createDataFrame([(f,) for f in files], "file string")
        .repartition(max(1, min(len(files), 64)))
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
    list — scales to millions of files; the driver only lists names)."""
    return _stats_for_files(spark, _list_files(spark, path), columns)


def pruned_read(
    spark: SparkSession,
    path: str,
    column: str,
    lo: float,
    hi: float,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Read only the files whose footer [min, max] for ``column`` overlaps
    [lo, hi], then apply the exact residual filter. Pass a precomputed
    ``stats`` index to skip the footer pass (the production shape: the
    index is maintained as its own table by the compaction job)."""
    stats = stats if stats is not None else collect_file_stats(spark, path, [column])
    keep = [
        r.file
        for r in stats.filter(
            (F.col("column") == column)
            & (F.col("max_val") >= lo)
            & (F.col("min_val") <= hi)
        ).collect()
    ]
    schema = spark.read.parquet(path).schema
    if not keep:
        return spark.createDataFrame([], schema).filter(
            F.col(column).between(lo, hi)
        )
    return (
        spark.read.schema(schema)
        .parquet(*keep)
        .filter(F.col(column).between(lo, hi))
    )


def update_file_stats(
    spark: SparkSession, path: str, existing: DataFrame, columns: list[str]
) -> tuple[DataFrame, int]:
    """Incremental index maintenance: footer-scan ONLY files not yet in
    ``existing`` (and drop index rows for files that no longer exist, e.g.
    after compaction). Returns (fresh index, n_new_files). The production
    cadence: the streaming sink appends files continuously; the index job
    diffs the listing — a metadata-only operation — instead of re-reading
    every footer, so index maintenance cost tracks the WRITE rate, not the
    table size."""
    current = set(_list_files(spark, path))
    known = {r.file for r in existing.select("file").distinct().collect()}
    new_files = sorted(current - known)
    kept = existing.filter(F.col("file").isin(list(current)) if current else F.lit(False))
    if not new_files:
        return kept.localCheckpoint(eager=True), 0
    fresh = _stats_for_files(spark, new_files, columns)
    return kept.unionByName(fresh).localCheckpoint(eager=True), len(new_files)
