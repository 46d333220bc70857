"""Local oracle-parity harness — mimics the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + sorted values
(order-insensitive, like the driver's value-hash).

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import os

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from kafka_map_reduce_spark.sources import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns."""
    out = df.copy()
    out.columns = [str(c) for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            out[c] = s.map(_canon_cell)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
    key = out.astype(str)
    order = key.sort_values(by=list(out.columns)).index
    return out.loc[order].reset_index(drop=True)


def _canon_cell(v):
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        return str(pd.Timestamp(v).floor("us"))
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        # The driver's value-hash distinguishes 6 from 6.0: an integer
        # column on one engine and a float column on the other is a
        # mismatch even when every value coerces equal (this masked the
        # q_math_funcs ceil/floor BIGINT-vs-DOUBLE failure in round 1).
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} <= {"i", "u", "f"} and (ka in "iu") != (kb in "iu"):
            problems.append(
                f"column {c!r} dtype kind differs: spark={a[c].dtype} duck={b[c].dtype}"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        neq = []
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _cell_eq(x, y):
                neq.append(i)
                if len(neq) >= 3:
                    break
        if neq:
            samp = [(i, av.iloc[i], bv.iloc[i]) for i in neq]
            problems.append(f"column {c!r} differs at rows {samp}")
    return problems


def _cell_eq(x, y) -> bool:
    if x is None and y is None:
        return True
    if isinstance(x, float) or isinstance(y, float):
        try:
            xf, yf = float(x), float(y)
        except (TypeError, ValueError):
            return False
        if math.isnan(xf) and math.isnan(yf):
            return True
        return xf == yf
    if isinstance(x, tuple) and isinstance(y, tuple):
        return len(x) == len(y) and all(_cell_eq(a, b) for a, b in zip(x, y))
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass
    return x == y


def oracle_for(spec, sf_dir: str) -> str:
    """Oracle SQL adjusted to ``sf_dir``: oracles that read files directly
    (read_blob) pin the DRIVER's sf0.01 path (the driver runs them
    verbatim, no dir parameter); local sweeps rewrite the path."""
    return spec.oracle.replace("/root/testdata/sf0.01", sf_dir)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session("parity", master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    specs = all_queries()

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracle_for(spec, sf_dir)).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
