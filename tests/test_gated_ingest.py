"""Quality-gated streaming ingest (streaming/gated.py): routing parity
with batch scoring, retry idempotence, and conservation (accept ∪
reject == input, disjoint)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.classifier import (
    logreg_fit,
    logreg_predict,
    quality_features,
)
from kafka_map_reduce_spark.streaming.gated import (
    gate_micro_batch,
    gated_ingest_stream,
)


@pytest.fixture(scope="module")
def seed_model(spark):
    """Frozen weights trained on a labeled seed: clean prose vs digit
    junk (the test_classifier fixture shape)."""
    clean = [
        (i, f"the quick brown fox jumps over the lazy dog by the river {i}", 1)
        for i in range(30)
    ]
    junk = [(100 + i, ("%d%d@@##" % (i, i * 7)) * 10, 0) for i in range(30)]
    seed = spark.createDataFrame(clean + junk, "id long, text string, y int")
    w = logreg_fit(
        seed.withColumn("x", quality_features(F.col("text"))),
        "x",
        "y",
        dim=8,
        iters=40,
        lr=2.0,
    )
    return w.localCheckpoint(eager=True)


@pytest.fixture()
def arriving(spark):
    mixed = [
        (200 + i, f"a calm clear morning on the hill with the old dog {i}")
        for i in range(20)
    ] + [(300 + i, ("%d##%d@@" % (i, i * 3)) * 12) for i in range(20)]
    return spark.createDataFrame(mixed, "doc_id long, text string")


def test_stream_routing_matches_batch_scoring(
    spark, seed_model, arriving, tmp_path
):
    src = str(tmp_path / "src")
    arriving.coalesce(1).write.parquet(src)
    accept, reject = str(tmp_path / "acc"), str(tmp_path / "rej")
    q = gated_ingest_stream(
        spark.readStream.schema(arriving.schema).parquet(src),
        seed_model,
        accept,
        reject,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    acc = spark.read.parquet(os.path.join(accept, "batch=*"))
    rej = spark.read.parquet(os.path.join(reject, "batch=*"))
    # conservation + disjointness
    assert acc.count() + rej.count() == arriving.count()
    assert (
        acc.select("doc_id").intersect(rej.select("doc_id")).count() == 0
    )
    # routing parity with direct batch scoring under the same weights
    expect = logreg_predict(
        arriving.withColumn("__x", quality_features(F.col("text"))),
        seed_model,
        "__x",
    )
    expect_acc = {
        r.doc_id for r in expect.filter(F.col("prob") >= 0.5).collect()
    }
    got_acc = {r.doc_id for r in acc.collect()}
    assert got_acc == expect_acc
    # the gate actually separates: clean docs accepted, junk rejected
    assert all(d < 300 for d in got_acc) and len(got_acc) == 20
    # reject rows carry the audit score
    assert "prob" in rej.columns


def test_retry_is_idempotent(spark, seed_model, arriving, tmp_path):
    """Re-running a batch id (the at-least-once redelivery case) leaves
    byte-identical table contents — the batch=<id> overwrite contract."""
    accept, reject = str(tmp_path / "acc"), str(tmp_path / "rej")
    gate_micro_batch(arriving, 7, seed_model, accept, reject)
    first = sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(accept, "batch=7")).collect()
    )
    gate_micro_batch(arriving, 7, seed_model, accept, reject)  # redelivery
    again = sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(accept, "batch=7")).collect()
    )
    assert first == again
    # still exactly one batch partition, no duplicate layout
    assert os.listdir(accept) == ["batch=7"] or sorted(
        os.listdir(accept)
    ) == sorted(["batch=7", "_SUCCESS"])


def test_null_text_routed_to_reject_not_dropped(spark, seed_model, tmp_path):
    """A NULL text yields a NULL score, which satisfies NEITHER
    threshold predicate — before the coalesce fix such rows vanished
    from both streams. They must land in reject with the -1.0 sentinel
    so conservation (accept ∪ reject == input) holds on dirty data."""
    rows = [
        (1, "the calm old river and the quiet dog walk home at dusk"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    accept, reject = str(tmp_path / "acc"), str(tmp_path / "rej")
    gate_micro_batch(df, 0, seed_model, accept, reject)
    acc = spark.read.parquet(os.path.join(accept, "batch=0"))
    rej = spark.read.parquet(os.path.join(reject, "batch=0"))
    assert acc.count() + rej.count() == 2
    scores = {r.doc_id: r.prob for r in rej.collect()}
    assert scores.get(2) == -1.0, f"null-text row not in reject: {scores}"
