"""Pre-verification for the r10 promotion registrations
(queries/promotions_r10.py): each prepared query runs at sf0.001 and is
hash-compared against its DuckDB oracle with the SAME canonicalizer the
local driver simulation uses (tools/parity.py) — so wrapping them in
@query in round 10 is a mechanical move over already-differentially-
tested code, not a new verification risk.

Deliberately NOT imported into the registry: registering a never-
driver-checked query forces it into the 50-row priority window
(test_registry_contract.py), and the r9 window is reserved for the
documented refresh queue."""

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


def test_promotions_are_not_registered_yet():
    """The deferral contract: preparing ≠ registering. If one of the
    five leaks into REGISTRY before its round, the priority-window
    contract test starts failing for a confusing reason — fail HERE
    with the real one instead."""
    from kafka_map_reduce_spark.registry import REGISTRY

    leaked = [n for n, _f, _o in R10_REGISTRATIONS if n in REGISTRY]
    assert not leaked, (
        f"r10 promotions registered early: {leaked} — move them into "
        "_PRIORITY's head instead (never-checked-first)"
    )


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
