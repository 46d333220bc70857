"""Parquet table maintenance: small-file compaction and sort-clustering.

The reference's sink writes fixed-size micro-batches (128-row HTTP inserts,
clickhouse.rs demo config) and delegates storage health to ClickHouse's
merge tree. A parquet lake has no such daemon: a streaming sink emitting a
file per micro-batch per partition produces millions of KB-sized files at
100 TB, and scan cost becomes dominated by file-open overhead instead of
bytes. These two operators are the merge-tree analogue:

- ``compact_parquet`` rewrites a directory to ~``target_file_bytes`` files
  (count derived from the *actual* on-disk bytes, not a guess).
- ``cluster_parquet`` additionally sorts by given keys during the rewrite
  (range-partition + sortWithinPartitions) so parquet row-group min/max
  stats become selective — point/range filters on the cluster keys then
  skip whole files and row groups instead of scanning everything.

Both write to a temp sibling directory and swap only after the new data is
fully committed (write-audit-publish): readers never observe half-written
DATA, and a failed rewrite leaves the original untouched. The publish is
two renames, so there is a brief window where ``path`` itself is absent —
run maintenance without concurrent readers (or behind a retrying reader).
For a truly atomic publish, flip a metastore/table-format pointer instead;
plain directory rename is atomic per-rename on HDFS/POSIX but not across
the pair, and object stores lack atomic rename entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_for(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` (works for file://, hdfs://, s3a://)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def parquet_file_stats(spark: SparkSession, path: str) -> dict:
    """Recursive (n_files, total_bytes) for the data files under ``path``."""
    fs, hpath, _ = _fs_for(spark, path)
    it = fs.listFiles(hpath, True)
    n = total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        n += 1
        total += f.getLen()
    return {"n_files": n, "total_bytes": total}


def _rmtree(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete of an unpublished temp dir."""
    fs, hpath, _ = _fs_for(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _swap(spark: SparkSession, tmp: str, path: str) -> None:
    fs, dest, jvm = _fs_for(spark, path)
    trash = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    # A trash dir surviving a crashed prior run is committed garbage (the
    # prior swap either published or rolled back before deleting it); left
    # in place it makes the first rename fail on every later compaction.
    if fs.exists(trash):
        fs.delete(trash, True)
    if not fs.rename(dest, trash):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(src, dest):
        fs.rename(trash, dest)  # roll back, original table intact
        raise IOError(f"compaction swap failed: could not publish {tmp}")
    fs.delete(trash, True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ceil(total_bytes / target_file_bytes) files of ~equal size.

    Round-robin repartition (not coalesce): coalesce merges whole input
    partitions and inherits their skew, while repartition rebalances by
    bytes-backed row counts — the point of the exercise. Returns
    before/after file stats."""
    before = parquet_file_stats(spark, path)
    n_out = max(1, -(-before["total_bytes"] // target_file_bytes))
    tmp = path.rstrip("/") + "__compact_tmp"
    spark.read.parquet(path).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(tmp)
    _swap(spark, tmp, path)
    after = parquet_file_stats(spark, path)
    return {"before": before, "after": after, "target_files": n_out}


def cluster_parquet(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact + sort-cluster by ``cluster_cols``: range-repartition on the
    keys, then sort within each output file. Each file then covers a
    narrow, near-disjoint key range, so parquet min/max row-group stats
    turn key predicates into file/row-group skips — the cheap half of
    Z-ordering, exact for single-key and prefix predicates."""
    before = parquet_file_stats(spark, path)
    n_out = max(1, -(-before["total_bytes"] // target_file_bytes))
    tmp = path.rstrip("/") + "__compact_tmp"
    df: DataFrame = spark.read.parquet(path)
    (
        df.repartitionByRange(n_out, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _swap(spark, tmp, path)
    after = parquet_file_stats(spark, path)
    return {"before": before, "after": after, "target_files": n_out}


def merge_upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
) -> dict:
    """Keyed upsert into a parquet table: base rows whose key collides
    with an update are replaced, new keys are appended — latest-wins
    semantics, the batch analogue of the ClickHouse ReplacingMergeTree
    the reference's sink writes into (clickhouse.rs demo table engine).

    Plan shape: one LEFT ANTI join of base against the (typically much
    smaller, broadcastable) update set's distinct keys, then a union with
    the updates and a write-audit-publish swap (same two-rename publish
    as compaction; same no-concurrent-reader caveat). Cost scales with
    the BASE table scan + rewrite, not with update count — at 100 TB you
    run it per partition-predicate slice, not whole-table; pair with
    ``cluster_parquet`` so update keys localize to few files.

    ``updates`` must not contain duplicate keys (latest-wins among
    duplicates would be nondeterministic); violations raise."""
    from concurrent.futures import ThreadPoolExecutor

    base = spark.read.parquet(path)
    key_set = updates.select(*keys).distinct()
    survivors = base.join(F.broadcast(key_set), keys, "left_anti")
    merged = survivors.unionByName(updates.select(*base.columns))
    tmp = path.rstrip("/") + "__compact_tmp"
    # Overlap the dup-key validation with the (invisible) tmp write
    # (r17, guide §2.6): publish still happens only after the check
    # passes, so a violation raises with the table untouched — the same
    # observable contract as the sequential form, minus one serial job
    # latency. Same overlap for the two model-sized audit counts below.
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_dup = pool.submit(
            lambda: updates.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .count()
        )
        f_write = pool.submit(
            lambda: merged.write.mode("overwrite").parquet(tmp)
        )
        dup = f_dup.result()
        if dup:
            f_write.result()
            _rmtree(spark, tmp)
            raise ValueError(f"updates contain duplicate keys on {keys}")
        f_write.result()
    _swap(spark, tmp, path)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_rows = pool.submit(lambda: spark.read.parquet(path).count())
        f_upd = pool.submit(updates.count)
        return {"n_rows": f_rows.result(), "n_updates": f_upd.result()}


def _zvalue(cols: list[str], bits: int = 16):
    """Z-order (Morton) key: each column min-max-normalized to ``bits``
    bits (bounds supplied as ``__min_<c>`` / ``__max_<c>`` columns from a
    1-row broadcast aggregate), then bit-interleaved so file ranges stay
    narrow in EVERY clustered dimension, not just the leading sort key.
    Pure JVM bit arithmetic — whole-stage codegen, no UDF."""
    from pyspark.sql import functions as F

    quantized = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        q = F.floor(
            (F.col(c).cast("double") - lo) / span * ((1 << bits) - 1)
        ).cast("long")
        quantized.append(q)
    k = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            z = z + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def zorder_parquet(
    spark: SparkSession,
    path: str,
    zorder_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> dict:
    """Compact + Z-ORDER by ``zorder_cols``: unlike ``cluster_parquet``
    (lexicographic — selective only for the leading key), the Morton curve
    keeps every file's bounding box small in all listed dimensions, so the
    data-skipping index (operators/skipping.py) prunes on ANY of them.
    The standard layout for a fact table filtered/joined on two or three
    independent keys."""
    from pyspark.sql import functions as F

    before = parquet_file_stats(spark, path)
    n_out = max(1, -(-before["total_bytes"] // target_file_bytes))
    tmp = path.rstrip("/") + "__compact_tmp"
    df = spark.read.parquet(path)
    bounds = df.agg(
        *[
            f
            for c in zorder_cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    )
    aux = [f"__min_{c}" for c in zorder_cols] + [f"__max_{c}" for c in zorder_cols]
    (
        df.join(F.broadcast(bounds))
        .withColumn("__z", _zvalue(zorder_cols, bits))
        .drop(*aux)
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _swap(spark, tmp, path)
    after = parquet_file_stats(spark, path)
    return {"before": before, "after": after, "target_files": n_out}
