"""r16 attribution of the r15 closing-bench cpu-axis excursion
(r15 verdict item #3, run with the r14_agg_group_idle playbook).

The r15 CLOSING session put the cpu class at calibrated 1.174 with
band [1.04, 1.324] excluding 1.0 on a byte-identical binary
(q_agg_group 1.28 -> 1.622 s, q_agg_percentile 1.172 -> 1.548 s vs
r14), while the SAME-code mid-round run was 0.994 classed-neutral
(q_agg_group 1.427, q_agg_percentile 1.146). The session's single
pre-headline cpu probe measured drift 1.02 — it under-tracked a
window where cpu-tracking queries moved 1.27-1.32x. Two candidate
attributions:

- host noise the probe protocol cannot see: the probe samples the
  host BEFORE the headline set; a co-tenant burst DURING queries
  1-7 (where both movers sit) is invisible to a pre/post pair. If
  true, an idle min-of-7 re-measure lands back on the cross-session
  wall-vs-cpu_sec fit (r14 fit for q_agg_group: slope 1.68,
  residuals <= 3.3% over three sessions).
- a real engine regression (ruled out by code identity — the r15
  diffs touch registry.py and a similarity.py docstring only,
  judge-verified — but the idle re-measure double-checks: a ~1.6 s
  idle wall at cpu_sec ~0.85 would mean the story is wrong).

Protocol: fresh session, bench.py's exact warm-up, then for EACH of
q_agg_group and q_agg_percentile 7 reps with ONE co-located cpu
probe sample immediately before each rep (the r16 bench protocol's
co-located sampling, so this measurement carries its own
moment-of-truth calibration). The cross-session fit is recomputed
from the BENCH_r*.json artifacts on disk, not hardcoded.

The pinned protocol rule this run certifies (shipped in bench.py the
same round): cpu_rel_spread pools pre + mid-headline + post +
co-located estimator readings (estimator_v16_quad), so a within-
window excursion widens the band instead of hiding between two
quiet endpoints.

Run on an idle host (check ``uptime`` first); paste the JSON into
SCALE_SPOT_r16 / the commit.

Usage: python tools/r16_cpu_axis_attrib.py
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

TARGETS = ("q_agg_group", "q_agg_percentile")


def history() -> list[dict]:
    """(round, cpu_sec, wall-per-target) from every BENCH_r*.json whose
    compact artifact carries both a cpu probe and the target queries at
    sf0.1 — the cross-session fit inputs, read not remembered."""
    rows = []
    for f in sorted(os.listdir(REPO)):
        if not (f.startswith("BENCH_r") and f.endswith(".json")):
            continue
        try:
            doc = json.load(open(os.path.join(REPO, f)))
        except (json.JSONDecodeError, OSError):
            continue
        parsed = doc.get("parsed", doc)
        if not isinstance(parsed, dict) or parsed.get("sf") != 0.1:
            continue
        cal = parsed.get("calibration") or {}
        q = parsed.get("queries") or {}
        if cal.get("cpu_sec") and all(t in q for t in TARGETS):
            rows.append(
                {
                    "file": f,
                    "cpu_sec": cal["cpu_sec"],
                    **{t: q[t] for t in TARGETS},
                }
            )
    return rows


def fit_no_intercept(points: list[tuple[float, float]]) -> dict:
    """Least-squares slope of wall = slope * cpu_sec through the origin
    (the r14 q_agg_group fit shape) + per-point residuals.

    Existence checks are explicit (ADVICE r16 #2): a slope that
    computes to exactly 0.0 is a real (degenerate) fit and must be
    reported as 0.0 with its residuals, not collapsed to null by a
    truthiness guard. Residuals are undefined where slope * x == 0."""
    sxx = sum(x * x for x, _ in points)
    sxy = sum(x * y for x, y in points)
    slope = sxy / sxx if sxx > 0 else None
    resid = []
    if slope is not None:
        resid = [
            round((y - slope * x) / (slope * x), 4) if slope * x != 0 else None
            for x, y in points
        ]
    return {
        "slope": round(slope, 4) if slope is not None else None,
        "residuals": resid,
    }


def loo_residuals(points: list[tuple[float, float]]) -> list:
    """Per-point leave-one-out residuals (ADVICE r16 #1): each point is
    judged against a fit over the OTHER points only, so an excursion
    under test cannot inflate the slope and shrink its own residual —
    the bias the in-sample fit carries by construction."""
    out = []
    for i, (x, y) in enumerate(points):
        rest = [p for j, p in enumerate(points) if j != i]
        fit = fit_no_intercept(rest)
        s = fit["slope"]
        if s is None or s * x == 0:
            out.append(None)
        else:
            out.append(round((y - s * x) / (s * x), 4))
    return out


def _fit_only() -> dict:
    """Recompute the attribution arithmetic from on-disk artifacts only
    (no Spark, no re-measure): the cross-session fits over history()
    with per-point LEAVE-ONE-OUT residuals (ADVICE r16 #1), plus the
    idle min-of-7 walls already recorded in SCALE_SPOT_r16.json judged
    against LOO fits they did not influence. This is the mode the r17
    verification ran; the measured inputs are pinned artifacts, so the
    output is deterministic."""
    hist = history()
    out: dict = {"metric": "cpu_axis_attrib_fit_only", "history_files": [
        h["file"] for h in hist
    ], "fits": {}}
    try:
        spot = json.load(open(os.path.join(REPO, "SCALE_SPOT_r16.json")))
        idle7 = spot["cpu_axis_attribution_r16"]["idle_rerun_min_of_7"]
        idle = {
            "q_agg_group": {
                "min_wall": idle7["q_agg_group_wall"],
                "min_cpu": idle7["colocated_cpu_min"]["q_agg_group"],
            },
            "q_agg_percentile": {
                "min_wall": idle7["q_agg_percentile_wall"],
                "min_cpu": idle7["colocated_cpu_min"]["q_agg_percentile"],
            },
        }
    except (OSError, KeyError, json.JSONDecodeError):
        idle = {}
    for name in TARGETS:
        pts = [(h["cpu_sec"], h[name]) for h in hist]
        fit = fit_no_intercept(pts)
        loo = loo_residuals(pts)
        entry = {
            **fit,
            "loo_residuals": loo,
            "by_file": {
                h["file"]: {"in_sample": fit["residuals"][i], "loo": loo[i]}
                for i, h in enumerate(hist)
            },
            "n_points": len(pts),
        }
        if name in idle:
            # the idle point is out-of-sample by construction (not a
            # BENCH artifact), so the full-history fit is already a fit
            # it did not influence
            pred = (
                round(fit["slope"] * idle[name]["min_cpu"], 3)
                if fit["slope"] is not None
                else None
            )
            entry["idle_predicted_wall"] = pred
            entry["idle_measured_wall"] = idle[name]["min_wall"]
            entry["idle_residual"] = (
                round((idle[name]["min_wall"] - pred) / pred, 4)
                if pred
                else None
            )
        out["fits"][name] = entry
    return out


def main() -> int:
    if "--fit-only" in sys.argv[1:]:
        print(json.dumps(_fit_only()))
        return 0
    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session(
        "r16-cpu-axis-attrib",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    specs = all_queries()
    bench.materialize(specs["q_agg_group"].fn(spark, sf_dir).limit(1))
    bench.materialize(specs["q_udf_scalar"].fn(spark, sf_dir).limit(256))

    idle: dict = {}
    for name in TARGETS:
        walls, probes = [], []
        for _ in range(7):
            probes.append(round(bench.cpu_probe(1)[0], 3))
            t0 = time.time()
            bench.materialize(specs[name].fn(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        idle[name] = {
            "walls": walls,
            "min_wall": min(walls),
            "colocated_cpu_samples": probes,
            "min_cpu": min(probes),
        }

    hist = history()
    out: dict = {
        "metric": "r16_cpu_axis_attrib",
        "round": 16,
        "load1_at_start": load1,
        "history": hist,
        "idle_rerun": idle,
        "fits": {},
    }
    for name in TARGETS:
        pts = [(h["cpu_sec"], h[name]) for h in hist]
        fit = fit_no_intercept(pts)
        this = idle[name]
        pred = (
            round(fit["slope"] * this["min_cpu"], 3)
            if fit["slope"] is not None
            else None
        )
        out["fits"][name] = {
            **fit,
            # each artifact point judged against a fit it did not
            # influence (ADVICE r16 #1)
            "loo_residuals": loo_residuals(pts),
            "n_points": len(pts),
            "idle_predicted_wall": pred,
            "idle_measured_wall": this["min_wall"],
            "idle_residual": (
                round((this["min_wall"] - pred) / pred, 4) if pred else None
            ),
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
