"""As-of join (latest-record-at-or-before) — SURVEY §2.2 q_join_asof.

Spark has no native as-of join. The scalable formulation is the
union-and-fill pattern: tag both sides, union, and run a single
``last(..., ignorenulls=True)`` window partitioned by the join key and
ordered by (ts, tag). Cost = ONE shuffle on the key + a per-partition sort
— same complexity as a regular sort-merge join, no range explosion. This
is the plan that survives 100 TB; a theta-join (l.ts >= r.ts) would be a
quadratic nested-loop.

The reference has no joins at all; this is a Tier C extension for stream
enrichment (SURVEY §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` group (NULLs if none).

    ``right`` must be unique per (on, right_ts); pre-deduplicate otherwise
    (tie-breaking inside the window would be nondeterministic).
    """
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Align columns: union right rows (left-only columns as NULL).
    left_only = [c for c in left.columns if c not in set(on)]
    r_aligned = r.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only],
        "__ts",
        "__tag",
        "__r",
    )
    unioned = l.select(*on, *left_only, "__ts", "__tag", "__r").unionByName(r_aligned)
    matched = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1).select(
        *on,
        *left_only,
        *[F.col("__match").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
