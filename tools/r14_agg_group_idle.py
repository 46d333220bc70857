"""r14 idle-host re-measure of q_agg_group (r13 verdict item #3).

q_agg_group's raw r12->r13 ratio was 1.41x (1.182 -> 1.670 s), the one
shared headline query whose regression escaped its assigned
calibration axis. Its code path is PROVEN identical across the two
bench runs — ``git diff 76dc450..HEAD`` (the r12 bench commit vs r14
HEAD) touches only operators/dedup.py, queries/tierc_dedup.py and
registry.py; aggregates.py and sources/ (fan_out_scan) are
byte-identical — so the regression CANNOT be a plan change. The two
candidate attributions left:

- host/session: the r13 bench session was slower for this query's
  mixed profile (2.5 busy cores: partly the fanned parallel partial
  aggregate, partly single-thread final merge + py4j; the single-label
  axis assignment gave it "scan", whose drift 1.101 under-corrects a
  query that is ~60%% single-thread when host_cpu_drift was 1.341);
- a real plan/runtime regression (ruled out by code identity, but the
  idle re-measure double-checks: if the idle wall is ~1.65 s the story
  is wrong somewhere else).

Protocol: fresh session, bench.py's exact warm-up, min-of-7 walls +
busy-core reading per rep, plus the scan/cpu single-axis probes in the
same session so the measurement carries its own calibration context.
Run on an idle host (check ``uptime`` first); paste the JSON into
SCALE_SPOT_r14 / the commit.

Usage: python tools/r14_agg_group_idle.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session(
        "r14-agg-group-idle", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    specs = all_queries()
    # bench.py's exact warm-up so the min-of-n measures the plan
    bench.materialize(specs["q_agg_group"].fn(spark, sf_dir).limit(1))
    bench.materialize(specs["q_udf_scalar"].fn(spark, sf_dir).limit(256))

    walls, cores = [], []
    for _ in range(7):
        ts0 = bench.task_seconds(spark)
        t0 = time.time()
        bench.materialize(specs["q_agg_group"].fn(spark, sf_dir))
        wall = time.time() - t0
        ts1 = bench.task_seconds(spark)
        walls.append(round(wall, 3))
        cores.append(
            round(max(ts1 - ts0, 0.0) / wall, 1)
            if ts0 >= 0.0 and ts1 >= 0.0
            else 0.0
        )

    cpu = bench.cpu_probe(3)
    scan = bench.scan_probe(spark, sf_dir, 3)
    out = {
        "metric": "r14_agg_group_idle",
        "round": 14,
        "load1_at_start": load1,
        "walls": walls,
        "min_wall": min(walls),
        "busy_cores": cores,
        "cpu_probe_min": round(min(cpu), 3),
        "scan_probe_min": round(min(scan), 3),
        "r12_bench_wall": 1.182,
        "r13_bench_wall": 1.670,
        "code_identity": "git diff 76dc450..HEAD -- queries/aggregates.py sources/ is empty",
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
