"""Tier A pipeline semantics tests — the reference's mock-driven fault
injection pattern (/root/reference/src/lib.rs:1333-1409, 1887-1955):
poison specific records, assert the DLQ receives exactly those while the
main path continues; verify batch caps, checkpoint-commit idempotence,
and the delivery audits as engine self-checks.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE


def _events(spark):
    from kafka_map_reduce_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "events")


def test_par_map_dlq_split(spark):
    """Poisoned records -> DLQ with original columns; ok records -> sink."""
    from kafka_map_reduce_spark.streaming import MemorySink, Pipeline

    def transform(rec):
        if rec["event_id"] % 100 == 7:  # poison every 100th-ish record
            raise ValueError("boom")
        return {"doubled": rec["value"] * 2}

    sink, dlq = MemorySink(), MemorySink()
    pipe = Pipeline(_events(spark)).par_map(
        transform, T.StructType([T.StructField("doubled", T.DoubleType())])
    )
    metrics = pipe.run_batch(sink, dlq=dlq)

    poisoned = {r.event_id for r in dlq.rows}
    assert poisoned == {i for i in range(1000) if i % 100 == 7}
    assert metrics["written_rows"] == 1000 - len(poisoned)
    assert metrics["dlq_rows"] == len(poisoned)
    # DLQ carries the ORIGINAL record (provenance contract, lib.rs:526-540)
    assert {"event_id", "user_id", "event_type", "__err"} <= set(
        dlq.rows[0].asDict().keys()
    )
    ok = {r.event_id for r in sink.rows}
    assert ok.isdisjoint(poisoned) and len(ok) == 1000 - len(poisoned)


def test_sink_batch_cap(spark, tmp_path):
    """128-row sink batches (main.rs:115): every output file <= cap."""
    from kafka_map_reduce_spark.streaming import ParquetSink, Pipeline

    sink = ParquetSink(str(tmp_path / "out"), max_batch_rows=128)
    Pipeline(_events(spark).coalesce(1)).run_batch(sink)
    sizes = [
        len(pd.read_parquet(f)) for f in glob.glob(os.path.join(sink.path, "*.parquet"))
    ]
    assert sum(sizes) == 1000
    assert max(sizes) <= 128


def test_checkpoint_commit_idempotent(spark, tmp_path):
    """Offsets commit after sink success: re-running the drained stream on
    the same checkpoint re-processes nothing (HighwaterMark semantics,
    lib.rs:944-994)."""
    from kafka_map_reduce_spark.streaming import ParquetSink, Pipeline, file_replay_stream

    wd = str(tmp_path)
    ck = os.path.join(wd, "ckpt")
    out = ParquetSink(os.path.join(wd, "out"))

    def run_once():
        stream = file_replay_stream(spark, SF_SMOKE, "events", wd)
        return Pipeline(stream).run_stream(out, checkpoint_dir=ck)

    run_once()
    n1 = spark.read.parquet(out.path).count()
    run_once()  # same checkpoint: nothing new to consume
    n2 = spark.read.parquet(out.path).count()
    assert n1 == 1000
    assert n2 == n1


def test_delivery_audit_self_check(spark):
    """The README audit queries as engine self-checks: after exactly-once
    batch processing, no loss (delta explains only pre-existing gaps) and
    no duplicates."""
    from kafka_map_reduce_spark.queries.audits import double_write_audit
    from kafka_map_reduce_spark.streaming import MemorySink, Pipeline

    sink = MemorySink()
    Pipeline(_events(spark)).run_batch(sink)
    sunk = spark.createDataFrame([r.asDict() for r in sink.rows])
    dupes = double_write_audit(sunk, "user_id", "event_id")
    assert dupes.count() == 0  # no double-writes through the pipeline


def test_map_expr_then_filter(spark):
    from kafka_map_reduce_spark.streaming import MemorySink, Pipeline

    sink = MemorySink()
    (
        Pipeline(_events(spark))
        .map_expr(vv=F.col("value") * 10)
        .filter(F.col("vv") > 5000)
        .run_batch(sink)
    )
    assert all(r.vv > 5000 for r in sink.rows)
    assert len(sink.rows) == _events(spark).filter(F.col("value") > 500).count()


def test_stateful_reduce_matches_batch(spark, tmp_path):
    """Streaming stateful reducer == batch groupBy (Reducer lifecycle)."""
    from kafka_map_reduce_spark.registry import all_queries

    res = all_queries()["q_stream_stateful"].fn(spark, SF_SMOKE).toPandas()
    batch = (
        _events(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents_sum"
            ),
        )
        .toPandas()
    )
    a = res.sort_values("user_id").reset_index(drop=True)
    b = batch.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["user_id", "n", "cents_sum"]].astype("int64"),
        b[["user_id", "n", "cents_sum"]].astype("int64"),
    )
