"""Watermark-BOUNDED streaming dedup (tools/scale_spot.py:
watermark_dedup_audit — the production form of q_stream_dedup for
unbounded streams, SCALE_SPOT_r10 `watermark_dedup100`): pinned here at
test scale because the r10 scale run caught a real hazard worth a
regression gate — when file-replay order diverges from event-time order
(parallel write tasks finish in arbitrary mtime order), the watermark
jumps ahead and silently drops whole earlier ranges as late (56% of
rows in the first sf10 run). The audit pins arrival order to event-time
order via explicit mtimes; this test fails if that pinning (or
dropDuplicatesWithinWatermark's exactness/state-eviction contract)
regresses."""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scale_spot():
    spec = importlib.util.spec_from_file_location(
        "kmr_scale_spot_tool", os.path.join(_REPO, "tools", "scale_spot.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("kmr_scale_spot_tool", mod)
    spec.loader.exec_module(mod)
    return mod


def test_watermark_dedup_exact_with_bounded_state(spark):
    """Multi-batch replay (6 ts-range micro-batches at sf0.001) must be
    EXACT — every redelivered duplicate dropped, no original lost to
    late-arrival eviction — while streaming state stays strictly below
    the input size (the watermark evicts; unbounded dropDuplicates state
    would hold every key seen)."""
    audit = _scale_spot().watermark_dedup_audit(
        spark, "/root/testdata/sf0.001", rows_per_batch=200
    )
    assert audit["exact"], audit
    assert audit["n_batches_observed"] >= 5, audit
    assert 0 < audit["max_state_rows"] < audit["n_input_rows"], audit


def test_registered_watermark_dedup_exact_and_bounded(spark):
    """The REGISTERED face (q_stream_dedup_watermark, r10 verdict item
    #6) via its shared core: emitted rows equal the batch-DISTINCT set
    exactly (the same contract its DuckDB oracle hash-checks at the
    driver), and the audit channel witnesses bounded state — the
    watermark held fewer keys than the input at some point of the
    multi-batch replay."""
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark.queries.streaming_live import (
        _watermark_dedup_run,
    )
    from kafka_map_reduce_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    res, audit = _watermark_dedup_run(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    n_expected = ev.count()
    assert res.count() == n_expected
    # exactness at value level, not just cardinality
    assert res.exceptAll(ev).count() == 0
    assert ev.exceptAll(res).count() == 0
    assert audit["n_batches"] >= 3, audit
    n_input = n_expected + ev.filter(F.col("event_id") % 10 == 0).count()
    assert 0 < audit["max_state_rows"] < n_input, audit
