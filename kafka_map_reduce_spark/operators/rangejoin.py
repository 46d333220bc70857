"""Bucketed range join — the scale form of an interval/theta join.

A raw range predicate (``r.ts BETWEEN l.ts AND l.ts + W``) gives Spark no
equi-key, so the physical plan degenerates to a broadcast-nested-loop or
cartesian — quadratic, dead at 100 TB. The standard fix (the shape behind
range-join optimizations in modern engines): quantize both sides into
coarse buckets of width >= the interval, equi-join on (key, bucket) with
each left row probing its own and the next bucket, then apply the exact
range predicate as a residual filter. Cost = a hash shuffle on
(key, bucket) over 2x the left rows — linear, skew-handled by AQE —
with bucket width tuning the candidate-to-match ratio.

The reference has no joins; this is the Tier B/C generalization of its
time-window batching (flush_interval, lib.rs:786-792) to a relational
interval correlation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs (l, r) with equal ``keys`` and
    ``l.left_ts <= r.right_ts <= l.left_ts + window_seconds``.

    Both timestamps must be TIMESTAMP-typed. Left rows are exploded into
    their own bucket and the successor (a row's window can span at most
    two buckets when bucket width == window width); the equi-join on
    (keys, bucket) is what keeps the plan a hash join.

    Non-key column names must be disjoint between the two sides
    (including the two timestamp columns): the residual predicate
    references both by name, and duplicate names would be ambiguous after
    the join. Rename before calling — validated here so the failure is an
    explicit contract error, not an AMBIGUOUS_REFERENCE deep in analysis.
    """
    shared = (set(left.columns) & set(right.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"interval_bucket_join requires disjoint non-key column names; "
            f"rename the shared columns {sorted(shared)} on one side"
        )
    bucket = lambda c: (F.unix_timestamp(c) / window_seconds).cast("long")  # noqa: E731

    l = left.withColumn(
        "__bkt", F.explode(F.array(bucket(F.col(left_ts)), bucket(F.col(left_ts)) + 1))
    )
    r = right.withColumn("__bkt", bucket(F.col(right_ts)))
    residual: Column = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS")
    )
    return (
        l.join(r, keys + ["__bkt"])
        .filter(residual)
        .drop("__bkt")
        # the 2-bucket explode can produce the same matched pair twice when
        # a right row's bucket equals both probes — impossible here since
        # the two probe buckets differ, but distinct() would mask a future
        # bug; assert by construction instead (b and b+1 are never equal).
    )
