"""Differential verification for the r10 promotion registrations
(queries/promotions_r10.py): each query runs at sf0.001 and is
hash-compared against its DuckDB oracle with the SAME canonicalizer the
local driver simulation uses (tools/parity.py). Written in r9 as
pre-verification for the then-unregistered functions; since r10 they
are @query-registered, so this is now the ordinary per-query
differential pin plus a registration-shape guard (the five must head
the priority window as never-checked rows)."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

from kafka_map_reduce_spark.queries.promotions_r10 import R10_REGISTRATIONS

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = "/root/testdata/sf0.001"


def _parity():
    spec = importlib.util.spec_from_file_location(
        "kmr_parity_tool", os.path.join(_REPO, "tools", "parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("kmr_parity_tool", mod)
    spec.loader.exec_module(mod)
    return mod


def test_promotions_are_registered_at_the_window_head():
    """The r10 registration contract: all five promotions are in
    REGISTRY with their oracle SQL attached, and — WHILE never driver-
    checked — they occupy the head of the priority window
    (never-checked-first, per test_registry_contract.py::
    test_never_checked_outranks_stale). Once CORRECTNESS artifacts
    carry their rows (r10 did: all five hash-green on first check) the
    head requirement retires and later rounds rotate them like any
    other checked query; the registration + oracle pins are permanent."""
    from kafka_map_reduce_spark.registry import _PRIORITY, REGISTRY
    from tests.test_registry_contract import checked_queries

    names = [n for n, _f, _o in R10_REGISTRATIONS]
    unregistered = [n for n in names if n not in REGISTRY]
    assert not unregistered, f"r10 promotions missing: {unregistered}"
    for n, _f, oracle in R10_REGISTRATIONS:
        assert REGISTRY[n].oracle == oracle, f"{n}: oracle mismatch"
    if not set(names) <= checked_queries():
        assert list(_PRIORITY[: len(names)]) == names


@pytest.mark.parametrize(
    "name,fn,oracle", R10_REGISTRATIONS, ids=[n for n, _f, _o in R10_REGISTRATIONS]
)
def test_promotion_matches_oracle(spark, name, fn, oracle):
    parity = _parity()
    sdf = fn(spark, _SF_DIR).toPandas()
    assert len(sdf) > 0, f"{name} returned no rows"
    con = parity.duck_connection(_SF_DIR)
    ddf = con.execute(oracle).df()
    problems = parity.compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"
