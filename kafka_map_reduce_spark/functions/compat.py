"""Cross-engine deterministic float aggregation/rounding.

The driver hash-compares Spark results against DuckDB bit-for-bit, which
makes two FP pitfalls fatal:

1. ``round(double, 4)`` differs between engines on ties (Spark rounds the
   exact BigDecimal expansion HALF_UP; DuckDB rounds the scaled double).
   Fix: ``floor(x*10000 + 0.5)/10000`` — the same IEEE-754 ops in both
   engines give bit-identical results. (Positive-domain data.)

2. ``sum(double)`` is order-dependent; Spark's partial aggregation adds in
   partition order, DuckDB sequentially, so large sums differ in the last
   ulps and occasionally flip the 4th decimal. Fix: accumulate exactly in
   DECIMAL(18,6) (per-row cast of the identically-computed double, then an
   exact, associative decimal sum) — also the right answer at 100 TB, where
   a 1000-executor sum would otherwise be nondeterministic run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Deterministic 4-decimal rounding of a double (positive domain)."""
    return F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000)


def dsum4(col: Column) -> Column:
    """Exact decimal sum of a double expression, rounded to 4 decimals."""
    return F.round(F.sum(col.cast("decimal(18,6)")), 4).cast("double")


def davg4(col: Column) -> Column:
    """Deterministic mean: exact decimal sum -> one double division."""
    return round4(F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)))


# ---- oracle-SQL (DuckDB) twins: textual templates for the same math ----


def o_round4(expr: str, alias: str | None = None) -> str:
    s = f"floor(({expr}) * 10000 + 0.5) / 10000"
    return f"{s} AS {alias}" if alias else s


def o_sum4(expr: str, alias: str | None = None) -> str:
    s = f"CAST(round(sum(CAST({expr} AS DECIMAL(18,6))), 4) AS DOUBLE)"
    return f"{s} AS {alias}" if alias else s


def o_avg4(expr: str, alias: str | None = None) -> str:
    s = (
        f"floor((CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / count(*))"
        f" * 10000 + 0.5) / 10000"
    )
    return f"{s} AS {alias}" if alias else s
