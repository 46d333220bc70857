"""Distributed logistic regression (operators/classifier.py): gradient
correctness vs a numpy reference, separable-data accuracy, determinism,
L2 shrinkage, and the text-feature quality gate end-to-end.

The fit is iterative (no SQL oracle possible), so like kmeans/PQ its
guarantees live here as pinned floors and exact single-step parity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.classifier import (
    logreg_fit,
    logreg_predict,
    quality_features,
)

DIM = 3  # bias + 2 features


@pytest.fixture(scope="module")
def planted(spark):
    """Linearly separable 2-D data: label = x1 + x2 > 0, margin 0.2."""
    rows = []
    for i in range(400):
        # deterministic pseudo-random grid, no RNG
        x1 = ((i * 37) % 41 - 20) / 10.0
        x2 = ((i * 17) % 29 - 14) / 10.0
        s = x1 + x2
        if abs(s) < 0.2:
            continue
        rows.append((i, [1.0, x1, x2], 1 if s > 0 else 0))
    return spark.createDataFrame(rows, "id long, x array<double>, y int")


def test_single_step_matches_numpy(spark, planted):
    """One GD step must equal the closed-form full-batch gradient -
    catches sign errors, mean-vs-sum drift, and posexplode misordering."""
    got = logreg_fit(planted, "x", "y", dim=DIM, iters=1, lr=0.5).collect()[0].w
    pdf = planted.toPandas()
    X = np.array(pdf["x"].tolist())
    y = pdf["y"].to_numpy().astype(float)
    w0 = np.zeros(DIM)
    p = 1.0 / (1.0 + np.exp(-(X @ w0)))
    grad = ((p - y) @ X) / len(y)
    expect = w0 - 0.5 * grad
    assert np.allclose(np.array(got), expect, atol=1e-12)


def test_separable_accuracy_floor(spark, planted):
    w = logreg_fit(planted, "x", "y", dim=DIM, iters=30, lr=1.0)
    scored = logreg_predict(planted, w, "x")
    acc = scored.select(
        F.avg(
            ((F.col("prob") > 0.5).cast("int") == F.col("y")).cast("double")
        ).alias("a")
    ).collect()[0].a
    assert acc >= 0.97, f"separable accuracy {acc:.3f} < 0.97"


def test_fit_is_deterministic(spark, planted):
    w1 = logreg_fit(planted, "x", "y", dim=DIM, iters=5, lr=1.0).collect()[0].w
    w2 = logreg_fit(planted, "x", "y", dim=DIM, iters=5, lr=1.0).collect()[0].w
    assert list(w1) == list(w2)


def test_l2_shrinks_weights(spark, planted):
    w0 = logreg_fit(planted, "x", "y", dim=DIM, iters=10, lr=1.0).collect()[0].w
    wl2 = logreg_fit(
        planted, "x", "y", dim=DIM, iters=10, lr=1.0, l2=0.5
    ).collect()[0].w
    # compare non-bias weight magnitudes
    assert sum(abs(v) for v in wl2[1:]) < sum(abs(v) for v in w0[1:])


def test_quality_gate_end_to_end(spark):
    """Train on clean prose vs junk (digit noise) and require the model
    to separate held-out examples of both — the fastText-style corpus
    gate in miniature, text -> JVM features -> fit -> scan-speed score."""
    clean = [
        f"the quick brown fox jumps over the lazy dog near a quiet river "
        f"and the day is calm {i}"
        for i in range(40)
    ]
    junk = [
        ("%d%d%d@@##" % (i, i * 7, i * 13)) * 8 for i in range(40)
    ]
    rows = [(i, t, 1) for i, t in enumerate(clean)] + [
        (100 + i, t, 0) for i, t in enumerate(junk)
    ]
    df = spark.createDataFrame(rows, "id long, text string, y int").withColumn(
        "x", quality_features(F.col("text"))
    )
    train = df.filter(F.col("id") % 4 != 0)
    heldout = df.filter(F.col("id") % 4 == 0)
    w = logreg_fit(train, "x", "y", dim=8, iters=40, lr=2.0)
    acc = (
        logreg_predict(heldout, w, "x")
        .select(
            F.avg(
                ((F.col("prob") > 0.5).cast("int") == F.col("y")).cast("double")
            ).alias("a")
        )
        .collect()[0]
        .a
    )
    assert acc >= 0.9, f"held-out quality-gate accuracy {acc:.3f} < 0.9"


def test_predict_plan_is_shuffle_free(spark, planted):
    w = logreg_fit(planted, "x", "y", dim=DIM, iters=1)
    scored = logreg_predict(planted, w, "x")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # the 1-row weights BroadcastExchange is the designed shape; what
    # must never appear is a data-sized shuffle
    for shuffle in ("Exchange hashpartitioning", "Exchange rangepartitioning",
                    "Exchange SinglePartition"):
        assert shuffle not in plan, "scoring must stay at scan speed"


def test_l2_exempts_bias_numpy_parity(spark, planted):
    """Regularized fit must match the closed-form update with the
    penalty EXCLUDED for the bias (feature 0) — standard logreg
    regularization never shrinks the intercept."""
    got = (
        logreg_fit(planted, "x", "y", dim=DIM, iters=3, lr=0.5, l2=0.3)
        .collect()[0]
        .w
    )
    pdf = planted.toPandas()
    X = np.array(pdf["x"].tolist())
    y = pdf["y"].to_numpy().astype(float)
    w = np.zeros(DIM)
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = ((p - y) @ X) / len(y)
        pen = 0.3 * w
        pen[0] = 0.0
        w = w - 0.5 * (grad + pen)
    assert np.allclose(np.array(got), w, atol=1e-12)
