"""Streaming mixture monitor (streaming/monitor.py): per-batch stats
conservation, redelivery idempotence, and dark-domain reporting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.streaming.monitor import (
    mixture_drift_report,
    mixture_monitor_stream,
    mixture_stats_batch,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, "web" if i % 4 else "books") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _targets(spark, pairs):
    return spark.createDataFrame(pairs, "domain string, tgt_frac double")


def test_stream_stats_conserve_and_report_matches_batch(
    spark, docs, tmp_path
):
    """Sum of per-batch stats rows == the input's per-domain counts, and
    the drift report equals a direct GROUP BY over the table."""
    src = str(tmp_path / "src")
    docs.repartitionByRange(3, "doc_id").write.parquet(src)
    stats = str(tmp_path / "stats")
    q = mixture_monitor_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        stats,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    # >1 micro-batch actually ran (the monitor is per-batch by design)
    batches = [d for d in os.listdir(stats) if d.startswith("batch=")]
    assert len(batches) >= 2
    got = {
        r.domain: r.n_docs
        for r in mixture_drift_report(
            spark, stats, _targets(spark, [("web", 0.5), ("books", 0.5)])
        ).collect()
    }
    want = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_redelivery_is_idempotent(spark, docs, tmp_path):
    stats = str(tmp_path / "stats")
    mixture_stats_batch(docs, 3, stats)
    first = sorted(
        (r.domain, r.n)
        for r in spark.read.parquet(os.path.join(stats, "batch=3")).collect()
    )
    mixture_stats_batch(docs, 3, stats)  # redelivery
    again = sorted(
        (r.domain, r.n)
        for r in spark.read.parquet(os.path.join(stats, "batch=3")).collect()
    )
    assert first == again


def test_dark_domain_still_reports(spark, docs, tmp_path):
    """A domain in the target mixture that never arrives must appear
    with n_docs = 0 and trip the drift flag — a source going dark is
    the event the monitor exists for."""
    stats = str(tmp_path / "stats")
    mixture_stats_batch(docs, 0, stats)
    rep = {
        r.domain: r
        for r in mixture_drift_report(
            spark,
            stats,
            _targets(
                spark, [("web", 0.4), ("books", 0.3), ("arxiv", 0.3)]
            ),
        ).collect()
    }
    assert rep["arxiv"].n_docs == 0
    assert rep["arxiv"].over == 1
    assert rep["arxiv"].drift == -0.3


def test_rogue_domain_surfaces_with_zero_target(spark, docs, tmp_path):
    """The inverse of the dark-domain test: a domain flooding the STREAM
    that is absent from the target mixture must surface with
    tgt_frac = 0.0 and maximal positive drift — and its rows must count
    in the grand total (the classic unregistered-source mixture
    incident must shift the report, not vanish from it)."""
    stats = str(tmp_path / "stats")
    mixture_stats_batch(docs, 0, stats)  # 150 web + 50 books
    rep = {
        r.domain: r
        for r in mixture_drift_report(
            spark, stats, _targets(spark, [("web", 1.0)])
        ).collect()
    }
    # rogue "books" (50 of 200 rows) reports with zero target
    assert rep["books"].n_docs == 50
    assert rep["books"].tgt_frac == 0.0
    assert rep["books"].drift == 0.25
    assert rep["books"].over == 1
    # and its rows are IN the denominator: web is 150/200, not 150/150
    assert rep["web"].obs_frac == 0.75
    assert rep["web"].drift == -0.25
