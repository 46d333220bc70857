"""Dress rehearsal of the external correctness driver.

Simulates the driver contract exactly: imports ``__spark_entry__`` by
path, builds a VANILLA SparkSession (no engine configs — the driver owns
its session; this is what catches missing runtime-conf plumbing), runs
the first N entries of ``queries()`` in iteration order against
``oracle_sql()`` DuckDB views over the same parquet, and canonicalizes
results the way the driver does (columns sorted by name, then
``sort_values`` over every column — which also crashes on array/map
cells, the historical failure mode).

Usage: python tools/rehearsal.py [sf_dir] [first_n]
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _hash(df) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float):
                v = round(v, 6)
            h.update(repr(v).encode())
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = mod.queries(), mod.oracle_sql()
    bad: list[str] = []
    for name in list(qs)[:first_n]:
        t0 = time.time()
        try:
            sdf = _canon(qs[name](spark, sf).toPandas())
            if name not in oracles:
                status = "rows-only"
            else:
                odf = _canon(con.execute(oracles[name]).df())
                ok = len(sdf) == len(odf) and _hash(sdf) == _hash(odf)
                status = "pass" if ok else "FAIL"
        except Exception:
            status = "ERR"
            print(traceback.format_exc()[-600:], flush=True)
        if status in ("FAIL", "ERR"):
            bad.append(name)
        print(f"{status:9s} {name} ({time.time() - t0:.1f}s)", flush=True)

    print(json.dumps({"checked": min(first_n, len(qs)), "bad": bad}))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
