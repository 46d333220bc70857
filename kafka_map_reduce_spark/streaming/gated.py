"""Quality-gated streaming ingest: Tier A x the trainable classifier.

The live form of the corpus quality gate — each micro-batch is scored
with FROZEN logistic-regression weights (operators/classifier.py,
trained once on a labeled seed, persisted like the LSH band index or
k-means centroids) and split into an accept stream (corpus append) and a
reject stream carrying the score (the audit trail quality triage reads).
This is the production composition: the model trains rarely, the gate
runs on every arriving batch forever.

Idempotence follows the ingest_micro_batch convention
(queries/streaming_live.py:322): every output is an OVERWRITE of a
batch_id-keyed partition directory, so an at-least-once retry rewrites
exactly its own partitions and duplicates nothing. Unlike dedup ingest,
the gate reads NO prior state — each batch is scored independently —
so there is no read-own-write hazard at all; retries are trivially safe.

Scale: scoring is a broadcast of the one-row weights + a codegen'd dot
product (zero shuffles, tests/test_classifier.py asserts the plan); the
only per-batch cost beyond the scan is the two partition writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.classifier import (
    logreg_predict,
    quality_features,
)


def gate_micro_batch(
    batch_df: DataFrame,
    batch_id,
    weights: DataFrame,
    accept_path: str,
    reject_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
) -> None:
    """Score one micro-batch with the frozen ``weights`` row and route
    rows to accept/reject partition dirs (``batch=<id>/``)."""
    this_batch = str(batch_id)
    scored = logreg_predict(
        batch_df.withColumn("__x", quality_features(F.col(text_col))),
        weights,
        "__x",
    ).drop("__x")
    # A NULL text yields NULL features -> NULL prob, which fails BOTH
    # threshold predicates — the row would silently land in neither
    # stream, breaking conservation (accept ∪ reject == input). Route
    # unscorable rows to the reject/audit stream with a -1.0 sentinel
    # score (outside [0,1], unambiguous in the audit trail).
    scored = scored.withColumn("prob", F.coalesce(F.col("prob"), F.lit(-1.0)))
    scored.filter(F.col("prob") >= threshold).drop("prob").write.mode(
        "overwrite"
    ).parquet(os.path.join(accept_path, f"batch={this_batch}"))
    scored.filter(F.col("prob") < threshold).write.mode("overwrite").parquet(
        os.path.join(reject_path, f"batch={this_batch}")
    )


def gated_ingest_stream(
    stream_df: DataFrame,
    weights: DataFrame,
    accept_path: str,
    reject_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
):
    """Wire the gate as a foreachBatch sink; returns the started query.

    The weights frame must be a batch (non-streaming) one-row table —
    localCheckpoint or load it from the persisted model path before
    starting so every micro-batch scores against the same immutable
    model (re-reading a live path mid-stream would make the gate
    time-dependent and retries non-deterministic)."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda b, i: gate_micro_batch(
                b, i, weights, accept_path, reject_path, threshold, text_col
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
