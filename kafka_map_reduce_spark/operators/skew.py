"""Skew-aware join utilities.

At 100 TB a handful of hot keys can stall a shuffle join on one task.
Two remedies, composable:

- AQE skew-join splitting (enabled by session.py) — handles moderate skew
  transparently.
- Explicit salting (this module) — for pathological keys: the big side's
  rows are spread across ``buckets`` sub-keys by a deterministic hash of
  the whole row; the small(er) side is replicated ``buckets`` times. The
  join key becomes (key, salt), so one hot key fans out to ``buckets``
  tasks. Replication cost: |right| * buckets rows — use only when the
  right side is modest (dimension-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the left (big/skewed) side salted into ``buckets``
    sub-keys and the right side replicated to match. Result is identical
    to ``left.join(right, on, how)`` for inner/left joins."""
    l_salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    )
    r_replicated = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return l_salted.join(r_replicated, on + [SALT_COL], how).drop(SALT_COL)
