"""Capture `.explain("formatted")` for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set). Building a query may execute eager sub-jobs (e.g.
k-means training collects centroids); the captured plan is the final
DataFrame's physical plan, the same object the bench materializes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    from bench import HEADLINE

    names = sys.argv[3:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session(
        "kmr-plans", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    specs = all_queries()
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        sys.stderr.write(f"[plans] {path} ({len(text)} bytes)\n")
    spark.stop()


if __name__ == "__main__":
    main()
