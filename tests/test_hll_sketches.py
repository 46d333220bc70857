"""Incremental HLL distinct-count sketches (operators/sketches.py):
accuracy vs exact distinct, and the LOSSLESS-merge contract that makes
the per-batch sketch table equivalent to a full rescan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.sketches import (
    hll_column_sketches,
    hll_estimates,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_estimates_within_hll_error(spark, docs):
    est = {
        r.column: r.approx_distinct
        for r in hll_estimates(
            hll_column_sketches(docs, ["doc_id", "source", "lang"])
        ).collect()
    }
    exact = docs.agg(
        *[
            F.count_distinct(c).alias(c)
            for c in ("doc_id", "source", "lang")
        ]
    ).collect()[0]
    for c in ("doc_id", "source", "lang"):
        assert abs(est[c] - exact[c]) <= max(0.05 * exact[c], 1), (
            f"{c}: est {est[c]} vs exact {exact[c]}"
        )


def test_batch_union_matches_full_scan_within_error(spark, docs):
    """Sketching N batches and unioning tracks the full-scan sketch
    within the lgk=12 HLL error bound — the property that lets an
    ingest pipeline keep corpus stats current without rescans. (Not
    exact equality: a single small sketch stays in datasketches' exact
    sparse mode while a union promotes to dense registers.)"""
    cols = ["doc_id", "source"]
    full = {
        r.column: r.approx_distinct
        for r in hll_estimates(hll_column_sketches(docs, cols)).collect()
    }
    batches = [
        hll_column_sketches(docs.filter(F.col("doc_id") % 3 == i), cols)
        for i in range(3)
    ]
    table = batches[0]
    for b in batches[1:]:
        table = table.unionByName(b)
    merged = {
        r.column: r.approx_distinct for r in hll_estimates(table).collect()
    }
    for c in cols:
        assert abs(merged[c] - full[c]) <= max(0.02 * full[c], 2), (
            f"{c}: merged {merged[c]} vs full {full[c]}"
        )


def test_incremental_append_tracks_growth(spark, docs):
    """Appending a new batch's sketch row moves the estimate to the
    full-corpus value (within the error bound) — per-step cost is one
    batch scan plus a KB-sized sketch union, never a corpus rescan."""
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    table = hll_column_sketches(old, ["doc_id"])
    est_old = hll_estimates(table).collect()[0].approx_distinct
    table = table.unionByName(hll_column_sketches(new, ["doc_id"]))
    est_all = hll_estimates(table).collect()[0].approx_distinct
    full = hll_estimates(hll_column_sketches(docs, ["doc_id"])).collect()[
        0
    ].approx_distinct
    assert abs(est_all - full) <= max(0.02 * full, 2)
    assert est_old < est_all
