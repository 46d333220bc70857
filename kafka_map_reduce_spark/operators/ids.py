"""Contiguous global row-id assignment without a global sort.

Training-data pipelines need stable, dense sample ids (shard manifests,
example indexing, resumable epoch ordering). The naive
``row_number() OVER (ORDER BY key)`` funnels every row through a single
ordered partition — the one plan that cannot scale. The scale-safe shape
is the classic two-phase enumeration (what ``RDD.zipWithIndex`` does,
re-expressed declaratively):

1. range-partition by the order key and sort within partitions — the only
   O(rows) shuffle in the plan;
2. stamp ``monotonically_increasing_id()`` = (partition << 33) + local
   row index, pure JVM, which after (1) is ordered exactly like the key;
3. roll partition row-counts into prefix-sum offsets (O(partitions) rows
   through a single tiny window);
4. broadcast the offsets back: id = offset[partition] + local index + 1.

``localCheckpoint`` after (2) is a CORRECTNESS barrier, not a cache:
range-exchange sampling and monotonically_increasing_id are both
nondeterministic across re-executions, and steps (3) and (4) consume the
same subtree twice — without materialization Catalyst recomputes it per
branch and the two executions may disagree on partition boundaries,
producing silently wrong ids. On a cluster-with-storage deployment the
same barrier is a persisted temp table / DISK_ONLY persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MID = "__mid"
_PID = "__pid"
_OFFSET = "__offset"

_LOCAL_BITS = 33  # monotonically_increasing_id: partition_id << 33 | local


def contiguous_row_ids(
    df: DataFrame, order_cols: list[str], id_col: str = "row_id"
) -> DataFrame:
    """Add ``id_col`` = 1-based dense global rank by ``order_cols``.

    ``order_cols`` must be a total order (include a unique key as the last
    tie-breaker) — with ties the assignment within a tie group follows
    physical row order, which is not reproducible across runs."""
    stamped = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_MID, F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright(F.col(_MID), _LOCAL_BITS).alias(_PID)
    local = F.col(_MID).bitwiseAND((1 << _LOCAL_BITS) - 1)
    counts = stamped.groupBy(pid).agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        _PID,
        F.coalesce(
            # Unpartitioned window BY DESIGN: its input is the per-partition
            # count rollup — O(num_partitions) rows, never O(data) — so the
            # WindowExec "No Partition Defined" warning it triggers is safe.
            F.sum("__n").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFFSET),
    )
    return (
        stamped.withColumn(_PID, pid)
        .join(F.broadcast(offsets), _PID)
        .withColumn(id_col, (F.col(_OFFSET) + local + 1).cast("long"))
        .drop(_MID, _PID, _OFFSET)
    )


def running_total(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "cum_before",
) -> DataFrame:
    """Add ``out_col`` = exclusive prefix sum of ``weight_col`` in
    ``order_cols`` order (sum over all rows strictly BEFORE this row).

    The weighted generalization of :func:`contiguous_row_ids`, and the
    primitive behind GPT-style sequence packing (concatenate the token
    stream, split every ``budget`` tokens): a global
    ``sum() OVER (ORDER BY key)`` funnels all rows through one reducer,
    so instead:

    1. range-partition + sort by the order key (the one O(rows) shuffle
       whose width is the order key + weight);
    2. per-partition local prefix sums via a window PARTITIONED by the
       physical partition id — one more O(rows) exchange, but every
       window group is exactly one range partition, so the work is even
       by construction (no skewed key can exist: pids are synthetic);
    3. per-partition totals roll into offsets through a single tiny
       O(partitions)-row window, broadcast back.

    Same ``localCheckpoint`` determinism barrier as contiguous_row_ids:
    steps 2 and 3 consume the stamped subtree twice, and range-exchange
    sampling is nondeterministic across re-executions."""
    stamped = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_MID, F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright(F.col(_MID), _LOCAL_BITS)
    totals = stamped.groupBy(pid.alias(_PID)).agg(
        F.sum(weight_col).alias("__t")
    )
    offsets = totals.select(
        _PID,
        F.coalesce(
            # Unpartitioned window BY DESIGN: O(num_partitions) rollup rows
            # only — the WindowExec "No Partition Defined" warning is safe.
            F.sum("__t").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFFSET),
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(_MID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        stamped.withColumn(_PID, pid)
        .withColumn("__local", F.coalesce(F.sum(weight_col).over(w_local), F.lit(0)))
        .join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_OFFSET) + F.col("__local")).cast("long"))
        .drop(_MID, _PID, _OFFSET, "__local")
    )


def hash_split(
    id_col, salt: str = "split:", train_below: int = 980, val_below: int = 990
):
    """Deterministic train/val/test assignment from a salted md5 of the
    id: returns ``(bucket, split)`` Columns where bucket ∈ [0, 1000) and
    split ∈ {train, val, test} (98/1/1 by default).

    A doc's split depends only on its id — stable under corpus growth,
    re-partitioning, and engine choice (md5's first 4 hex chars parse
    identically everywhere; the registered q_split_assign query pins the
    DuckDB twin). The salt decorrelates the split from every other
    id-keyed hash in the pipeline (LSH bands, hash sampling, shard
    assignment). Pure JVM expression — scan speed, zero shuffles."""
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1000),
    )
    split = (
        F.when(bucket < train_below, F.lit("train"))
        .when(bucket < val_below, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return bucket, split


def grouped_running_total(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    weight_col: str,
    out_col: str = "cum_before",
) -> DataFrame:
    """:func:`running_total` per group: ``out_col`` = exclusive prefix
    sum of ``weight_col`` within each ``group_cols`` value, in
    ``order_cols`` order — the primitive behind per-domain token-budget
    selection (realize a mixture by taking each domain's docs in
    deterministic order until its budget is spent).

    The naive ``sum() OVER (PARTITION BY group ORDER BY key)`` funnels
    every hot group through one reducer — the same pathology the global
    form avoids, now per group. Same two-phase cure: range-partition by
    (group, order) so a hot group SPANS partitions; local exclusive sums
    in a window keyed by (physical partition, group); per-(group,
    partition) totals roll into offsets through a tiny O(groups x
    partitions) window and broadcast back. No group ever concentrates:
    window groups are (synthetic pid, group) slices of one sorted range.
    """
    keys = group_cols + order_cols
    stamped = (
        df.repartitionByRange(*keys)
        .sortWithinPartitions(*keys)
        .withColumn(_MID, F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright(F.col(_MID), _LOCAL_BITS)
    totals = stamped.groupBy(pid.alias(_PID), *group_cols).agg(
        F.sum(weight_col).alias("__t")
    )
    offsets = totals.select(
        _PID,
        *group_cols,
        F.coalesce(
            F.sum("__t").over(
                Window.partitionBy(*group_cols)
                .orderBy(_PID)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFFSET),
    )
    w_local = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(_MID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        stamped.withColumn(_PID, pid)
        .withColumn("__local", F.coalesce(F.sum(weight_col).over(w_local), F.lit(0)))
        .join(F.broadcast(offsets), [_PID, *group_cols])
        .withColumn(out_col, (F.col(_OFFSET) + F.col("__local")).cast("long"))
        .drop(_MID, _PID, _OFFSET, "__local")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsamp:",
    key_col: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — Efraimidis
    & Spirakis (IPL 2006) A-ES with the uniform draw derived from a
    salted md5 of the id instead of an RNG: key_i = ln(u_i) / w_i and
    the sample is the k largest keys. Same result on every engine, run,
    partitioning, and cluster size (the reproducibility contract of
    hash_split / q_sample_hash, extended to WEIGHTED selection — e.g.
    quality- or length-weighted corpus subsetting where a plain
    Bernoulli thin-out over-represents junk).

    Scale shape: the key is a pure JVM expression at scan speed (zero
    shuffles), and the k-largest selection is orderBy+limit =
    TakeOrderedAndProject — a per-partition k-heap + driver merge of
    partitions x k rows, never a global sort. Weights are clamped to
    >= 1e-9 so a zero-weight row gets key -> -inf (never sampled)
    rather than a NaN that Spark would sort first.

    u_i = (h+1)/(2^32+1) in (0,1) from the first 8 md5 hex chars: open
    at 0 so ln never sees 0, and the salt decorrelates the draw from
    every other id-keyed hash in the pipeline."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967297.0)
    key = F.log(u) / F.greatest(
        F.col(weight_col).cast("double"), F.lit(1e-9)
    )
    return (
        df.withColumn(key_col, key)
        .orderBy(F.desc(key_col), F.col(id_col))
        .limit(k)
    )
