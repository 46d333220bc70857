"""Pins for bench.py's cross-round calibration arithmetic (r13: the
per-class axis certification of the r12 verdict item #3). Pure-Python —
no Spark session; shared_vs_prev reads prior BENCH_r*.json artifacts
from the repo root, so the pins run against a synthetic prev artifact
in tmp_path via monkeypatched REPO to stay independent of what rounds
exist on disk."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402


def _write_prev(tmp_path, queries, cal):
    doc = {"parsed": {"sf": 0.1, "queries": queries, "calibration": cal}}
    with open(os.path.join(tmp_path, "BENCH_r90.json"), "w") as fh:
        json.dump(doc, fh)


def test_per_class_calibration_divides_each_query_by_its_own_axis(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    prev_q = {"a": 2.0, "b": 4.0, "c": 1.0}
    prev_cal = {
        "cpu_sec": 1.0, "cpu_rel_spread": 0.0,
        "cpu_par_sec": 1.0, "cpu_par_rel_spread": 0.0,
        "scan_sec": 1.0, "scan_rel_spread": 0.0,
    }
    _write_prev(tmp_path, prev_q, prev_cal)
    # host: scan axis 2x slower, par axis unchanged, cpu axis 0.5x
    now_cal = {
        "cpu_sec": 0.5, "cpu_rel_spread": 0.0,
        "cpu_par_sec": 1.0, "cpu_par_rel_spread": 0.0,
        "scan_sec": 2.0, "scan_rel_spread": 0.0,
    }
    # each query's wall exactly tracks its axis => calibrated == 1.0
    per_query = {"a": 4.0, "b": 4.0, "c": 0.5}
    axis = {"a": "scan", "b": "par", "c": "cpu"}
    out = bench.shared_vs_prev(per_query, 91, 0.1, now_cal, axis)
    pc = out["per_class"]
    assert pc["scan"]["ratio_calibrated"] == 1.0
    assert pc["par"]["ratio_calibrated"] == 1.0
    assert pc["cpu"]["ratio_calibrated"] == 1.0
    assert out["ratio_calibrated_classed"] == 1.0
    # zero spreads => the classed band collapses onto the point estimate
    assert out["classed_band"] == [1.0, 1.0]
    # while the single-axis calibrations disagree wildly (the old-band
    # pathology this feature replaces):
    assert out["ratio_calibrated"] != out["ratio_calibrated_scan"]


def test_classed_band_widens_by_each_axis_own_spread_only(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    prev_q = {"a": 1.0, "b": 1.0}
    prev_cal = {
        "cpu_sec": 1.0, "cpu_rel_spread": 0.0,
        "cpu_par_sec": 1.0, "cpu_par_rel_spread": 0.0,
        "scan_sec": 1.0, "scan_rel_spread": 0.0,
    }
    _write_prev(tmp_path, prev_q, prev_cal)
    now_cal = {
        "cpu_sec": 1.0, "cpu_rel_spread": 0.5,  # noisy cpu axis
        "cpu_par_sec": 1.0, "cpu_par_rel_spread": 0.0,
        "scan_sec": 1.0, "scan_rel_spread": 0.1,
    }
    per_query = {"a": 1.0, "b": 1.0}
    out = bench.shared_vs_prev(
        per_query, 91, 0.1, now_cal, {"a": "scan", "b": "par"}
    )
    # no cpu-class query in the shared set => the 0.5 cpu spread must
    # not touch the classed band; scan contributes 0.1 on its half.
    assert "cpu" not in out["per_class"]
    lo, hi = out["classed_band"]
    assert 0.9 < lo <= 1.0 <= hi < 1.1
    assert out["per_class"]["scan"]["band"] == [
        round(1.0 / 1.1, 3),
        round(1.1, 3),
    ]
    assert out["per_class"]["par"]["band"] == [1.0, 1.0]


def test_missing_prev_scan_spread_is_one_sided_honest(tmp_path, monkeypatch):
    """The r12 artifact records scan_sec but no scan_rel_spread; the
    first cross-round scan band must still form (prev contributes 0),
    matching the cpu axis's r11 introduction convention."""
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    _write_prev(
        tmp_path,
        {"a": 1.0},
        {"cpu_sec": 1.0, "cpu_rel_spread": 0.0, "scan_sec": 1.0},
    )
    now_cal = {
        "cpu_sec": 1.0, "cpu_rel_spread": 0.0,
        "scan_sec": 1.0, "scan_rel_spread": 0.2,
    }
    out = bench.shared_vs_prev(
        {"a": 1.0}, 91, 0.1, now_cal, {"a": "scan"}
    )
    assert out["scan_calibration_rel_spread"] == 0.2
    assert out["per_class"]["scan"]["band"] == [round(1 / 1.2, 3), 1.2]


def test_axis_assignment_thresholds():
    """PAR_AXIS_MIN_CORES splits par from scan; the Python-worker set
    overrides to cpu below the threshold only (a 20-core pandas-UDF
    query is still capacity-bound). Calls bench.classify_axis — the
    rule main() uses — instead of re-implementing it (ADVICE r13)."""
    cores = {"q_udf_scalar": 2.0, "q_agg_group": 14.0, "q_join_asof": 1.8}
    axis = {n: bench.classify_axis(n, c) for n, c in cores.items()}
    assert axis == {
        "q_udf_scalar": "cpu",
        "q_agg_group": "par",
        "q_join_asof": "scan",
    }
    # a 20-core pandas-UDF query is capacity-bound, not cpu-bound
    assert bench.classify_axis("q_udf_scalar", 20.0) == "par"
    # boundary is inclusive on the par side
    assert bench.classify_axis("q_x", bench.PAR_AXIS_MIN_CORES) == "par"
    # measured single-thread-affinity override (r14: the three-session
    # cpu_sec fit, see CPU_AXIS_QUERIES) beats the scan default below
    # the par threshold, and only below it
    assert bench.classify_axis("q_agg_group", 2.5) == "cpu"
    assert bench.classify_axis("q_agg_group", 14.0) == "par"


def test_pinned_axis_map_is_stable_and_covers_the_headline_set():
    """r15 verdict item #4: the certification axis must be deterministic
    per query, not per session — two same-code r15 runs classified the
    same 18 queries differently (cpu n=1/par n=3 vs cpu n=2/par n=2)
    because q_agg_group and q_dedup_near_capped measure across
    PAR_AXIS_MIN_CORES run to run. This pins the exact map; changing an
    assignment means editing BOTH bench.QUERY_AXIS_PINNED and this test
    in one reviewed commit."""
    assert bench.QUERY_AXIS_PINNED == {
        "q_agg_group": "cpu",
        "q_udf_scalar": "cpu",
        "q_dedup_near": "par",
        "q_dedup_near_capped": "par",
    }
    # every pinned name is a real headline query (a rename would
    # silently un-pin it back to the scan default)
    assert set(bench.QUERY_AXIS_PINNED) <= set(bench.HEADLINE)
    # the measured single-thread-affinity set stays consistent with
    # the pins (q_agg_group's r14 three-session fit)
    for q in bench.CPU_AXIS_QUERIES:
        assert bench.pinned_axis(q) == "cpu", q
    # everything un-pinned certifies against the scan axis
    assert bench.pinned_axis("q_orderby") == "scan"
    assert all(
        bench.pinned_axis(q) in {"cpu", "par", "scan"} for q in bench.HEADLINE
    )


def test_compact_artifact_keeps_every_cross_round_divisor():
    """Compact-line hygiene (r16): the detail-only exclusion sets must
    never swallow a scalar that a future round's shared_vs_prev divides
    by, or cross-round calibration dies one round later.
    cpu_colocated_min joined the divisor set in r17 (the cpu-class
    promotion)."""
    divisors = {
        "cpu_sec", "cpu_rel_spread",
        "cpu_par_sec", "cpu_par_rel_spread",
        "scan_sec", "scan_rel_spread",
        "cpu_colocated_min",
    }
    assert not divisors & bench.CAL_DETAIL_ONLY
    # per_class is the load-bearing certification; the ratio and the
    # classed aggregate must ride the compact line
    assert not {
        "ratio", "ratio_calibrated", "per_class",
        "ratio_calibrated_classed", "classed_band",
    } & bench.SVP_DETAIL_ONLY


def test_cpu_class_divisor_promotes_colocated_min_when_both_rounds_carry_it(
    tmp_path, monkeypatch
):
    """r17 decision (r16 verdict item #3): when BOTH rounds record
    cpu_colocated_min, the cpu-class drift divides co-located by
    co-located — the probe measured AT the moment the cpu-pinned
    queries ran, which BENCH_r16's live witness showed predicts their
    walls within 3% where the session-min probe predicts 17% low. The
    whole-set legacy ratio_calibrated stays cpu_sec-based."""
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    _write_prev(
        tmp_path,
        {"c": 1.0, "s": 1.0},
        {
            "cpu_sec": 1.0, "cpu_rel_spread": 0.0,
            "cpu_colocated_min": 0.8,
            "scan_sec": 1.0, "scan_rel_spread": 0.0,
        },
    )
    # host: co-located axis says cpu-moment 2x slower; the session-min
    # probe says unchanged (the r15 shape: quiet endpoints, busy
    # cpu-query window). The cpu-class query's wall doubled with it.
    now_cal = {
        "cpu_sec": 1.0, "cpu_rel_spread": 0.0,
        "cpu_colocated_min": 1.6,
        "scan_sec": 1.0, "scan_rel_spread": 0.0,
    }
    out = bench.shared_vs_prev(
        {"c": 2.0, "s": 1.0}, 91, 0.1, now_cal, {"c": "cpu", "s": "scan"}
    )
    pc = out["per_class"]["cpu"]
    assert pc["divisor"] == "colocated_min"
    assert pc["drift"] == 2.0
    assert pc["ratio_calibrated"] == 1.0  # excursion fully attributed
    # the legacy whole-set calibration still divides by cpu_sec
    assert out["host_cpu_drift"] == 1.0
    # scan class untouched by the promotion
    assert out["per_class"]["scan"]["ratio_calibrated"] == 1.0


def test_cpu_class_divisor_falls_back_to_cpu_sec_for_pre_r16_artifacts(
    tmp_path, monkeypatch
):
    """Rounds <= r15 carry no co-located field: the comparison must
    fall back to the same-definition cpu_sec pair on both sides and
    say so in the divisor record."""
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    _write_prev(
        tmp_path,
        {"c": 1.0},
        {"cpu_sec": 1.0, "cpu_rel_spread": 0.0},
    )
    now_cal = {
        "cpu_sec": 2.0, "cpu_rel_spread": 0.0,
        "cpu_colocated_min": 1.6,  # this round has one; prev does not
    }
    out = bench.shared_vs_prev({"c": 2.0}, 91, 0.1, now_cal, {"c": "cpu"})
    pc = out["per_class"]["cpu"]
    assert pc["divisor"] == "cpu_sec"
    assert pc["drift"] == 2.0
    assert pc["ratio_calibrated"] == 1.0


def test_multi_estimator_spread_covers_a_mid_headline_excursion():
    """r15 verdict item #3's protocol rule: the closing session's
    pre-vs-post drift read 1.02 (spread 0.05 floor) while cpu-class
    queries inside the headline window moved ~1.3x. With the r16 mid /
    co-located readings folded in, a 1.3x excursion at any sampled
    point widens the spread to cover it."""
    # pre 0.856, post 0.873 (the r15 shape: quiet endpoints) but the
    # mid-headline estimator caught the excursion at 1.11
    assert bench.estimator_rel_spread(0.856, 0.873, 1.11) == 0.2967
    # degenerates to the two-point r14 definition when only two
    # readings exist (old artifacts / SPARK_GRAFT_BENCH_N edge cases)
    assert bench.estimator_rel_spread(0.856, 0.873) == bench.CAL_SPREAD_FLOOR


def test_estimator_rel_spread_is_symmetric_and_matches_r13_case():
    """r14 cpu-band redefinition: the spread of the min-of-n estimator
    is the pre-vs-post estimator drift. The r13 numbers (pre 1.069,
    post 0.942) must give ~0.135, not the raw-range 0.487 that made
    the cpu band useless. A lucky pre==post run floors at
    CAL_SPREAD_FLOOR instead of collapsing the band to a point (the
    probe's measured same-code run-to-run disagreement is nonzero)."""
    assert bench.estimator_rel_spread(1.069, 0.942) == 0.1348
    assert bench.estimator_rel_spread(0.942, 1.069) == 0.1348
    assert bench.estimator_rel_spread(1.0, 1.0) == bench.CAL_SPREAD_FLOOR
    assert bench.estimator_rel_spread(1.0, 1.01) == bench.CAL_SPREAD_FLOOR
