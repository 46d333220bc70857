"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized via the noop sink (forces end-to-end
execution without driver-side row transfer, so timings reflect the plan,
not collect()).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Representative headline set: one per operator family, weighted toward
# the queries whose plans matter at scale.
HEADLINE = [
    "q_agg_group",        # flagship hash aggregate (TPC-H Q1 shape)
    "q_audit_delivery",   # the reference's own verification query
    "q_join_multiway",    # star join: fact-fact shuffle + broadcast dims
    "q_join_asof",        # custom as-of join (union + window)
    "q_window_rank",      # partitioned ranking window
    "q_orderby",          # global range-partitioned sort
    "q_agg_percentile",   # sort-based exact percentile
    "q_scan_json_lines",  # JSON decode over the wire format
    "q_udf_scalar",       # Arrow pandas-UDF path
    "q_dedup_near",       # MinHash+LSH near-dup (Tier C scale path)
    "q_sim_topk",         # brute-force ANN baseline
    "q_text_tokens",      # tokenize + TF + top-k
    "q_stream_tumbling",  # event-time windowing (batch face)
    "q_heavy_hitters",    # Misra-Gries pruned exact heavy hitters
    "q_dedup_editdist",   # FastSS deletion-signature similarity join
    "q_funnel",           # co-partitioned multi-stage event funnel
    "q_dedup_near_capped",  # LSH with the hot-band guard ON (skew path)
    "q_dedup_simhash_capped",  # SimHash with the hot-block guard ON
]


def materialize(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session(
        "kmr-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    specs = all_queries()

    # Warm-up (not timed): JVM codegen via a tiny aggregate, and the
    # Python-UDF worker pool via a small Arrow round-trip — so timings
    # measure the plans, not one-time JVM JIT / worker-fork costs.
    materialize(specs["q_agg_group"].fn(spark, sf_dir).limit(1))
    materialize(specs["q_udf_scalar"].fn(spark, sf_dir).limit(256))

    # n repeats per query, report the MIN: single-run timings at sf0.1
    # carry ~0.4 s of fixed harness noise plus host-load jitter, which
    # masqueraded as >20% "regressions" between rounds. The min of n>=3
    # is the standard low-variance estimator for a cold-cache-free plan.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            materialize(specs[name].fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        per_query[name] = round(best, 3)

    total = round(sum(per_query.values()), 3)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "runs_per_query": n_runs,
                "estimator": "min",
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
