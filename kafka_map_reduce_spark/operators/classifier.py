"""Distributed logistic regression — the trainable quality gate.

Production corpus builds grade documents with a learned classifier
(fastText in GPT-3/LLaMA's pipeline: train on a seed of known-good vs
known-bad docs, keep what scores well), not only with the fixed
heuristics of operators/text.py. The reference has no ML surface at all
(its compute stops at the four pipeline stages, lib.rs:235-383); this is
part of the engine's Tier-C training-data extensions.

Full-batch gradient descent. Since r17 each iteration is exactly ONE
ungrouped aggregate over the checkpointed training projection — dim
double-sum buffers, map-side partial aggregation, no shuffle wider than
dim doubles — with the dim-sized weight update applied on the driver
(model-sized by construction, the same collect class as
similarity.kmeans_fit's centroids; the pre-r17 all-DataFrame update
spent 5.3 s/fit building per-iteration plans against 0.1 s of executor
work). Scoring attaches the final weights as a one-row broadcast.
Fixed iteration count + deterministic init => deterministic fits.

Features are an ``array<double>`` column; ``quality_features`` builds a
standard set from raw text with pure JVM expressions (no Python on the
per-row path — the classifier's scoring cost at 100 TB is one codegen'd
dot product per document).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.text import STOPWORDS, tokens


def quality_features(text_col: Column) -> Column:
    """Per-document feature vector (array<double>, fixed order):
    [1.0 (bias), scaled length, punct ratio, stopword ratio, mean token
    length / 10, digit ratio, uppercase ratio, non-alnum ratio].

    All bounded O(1)-ish ratios so gradient descent needs no feature
    normalization pass (a corpus-wide min/max scan would be one more
    shuffle); the bias term is folded in as feature 0 so the model is a
    single weight array."""
    toks = tokens(text_col)
    n_chars = F.length(text_col).cast("double")
    n = F.greatest(n_chars, F.lit(1.0))
    n_toks = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    punct = (
        F.length(text_col)
        - F.length(F.regexp_replace(text_col, r"[.,;:!?]", ""))
    ).cast("double")
    digits = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, r"[0-9]", ""))
    ).cast("double")
    uppers = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    ).cast("double")
    nonaln = (
        F.length(text_col)
        - F.length(F.regexp_replace(text_col, r"[^A-Za-z0-9 ]", ""))
    ).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(list(STOPWORDS)))
    ).cast("double")
    mean_tok_len = (n_chars - (n_toks - 1)) / n_toks
    return F.array(
        F.lit(1.0),
        F.least(n_chars / 1000.0, F.lit(1.0)),
        punct / n,
        stop_hits / n_toks,
        mean_tok_len / 10.0,
        digits / n,
        uppers / n,
        nonaln / n,
    )


def _dot(w: Column, x: Column) -> Column:
    return F.aggregate(
        F.zip_with(w, x, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _dlit(x: float) -> str:
    """Exact SQL face of a Python float: repr() is the shortest
    round-tripping decimal form and Spark's string->double cast parses
    correctly rounded, so CAST('<repr>' AS DOUBLE) constant-folds to the
    bit-identical double F.lit(x) would carry (collect-verified in the
    r17 A/B). Finite-only by contract — GD weights under the sigmoid
    residual are bounded."""
    import math

    if not math.isfinite(x):
        raise ValueError(f"non-finite weight in logreg_fit: {x}")
    return f"CAST('{x!r}' AS DOUBLE)"


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    features_col: str,
    label_col: str,
    dim: int,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
) -> DataFrame:
    """Full-batch gradient descent; returns a ONE-ROW DataFrame
    ``(w: array<double>)`` of length ``dim`` (bias folded into the
    features as a constant-1 component — see quality_features).

    Divergence behavior (ADVICE r17): a fit that drives any weight
    non-finite (an over-large ``lr``) RAISES ValueError mid-fit (from
    ``_dlit``'s finite-literal guard) instead of silently completing
    with NaN weights as the pre-r17 join-based loop did — the explicit
    "learning rate diverged" signal is strictly safer than NaN scores
    downstream.

    grad_j = mean((sigmoid(w.x) - y) * x_j) + l2 * w_j for j >= 1 (the
    bias at j = 0 is exempt from the penalty); the mean keeps
    ``lr`` corpus-size-independent. ``dim`` is explicit (not probed from
    the data) so the init is a pure literal and the fit plan never runs
    a row-sampling job.

    Scale: the gradient aggregate is the ONLY data-sized stage per
    iteration, and map-side partial aggregation reduces it to
    dim x partitions narrow rows; everything else is dim-double model
    state. The same shape at 1000 executors: one treeish aggregate per
    iteration.

    r17 restructure (guide §1.2 "per-task work" + §5 driver rules; the
    profile showed this operator DRIVER-bound — 5.3 s of plan
    construction against 0.1 s of executor work per fit at sf0.1): the
    gradient is now ONE ungrouped aggregate of ``dim`` sums over the
    checkpointed training projection, and the ``lr``/``l2`` update runs
    on the driver over the collected dim-double gradient — model-sized
    by construction, the same class as kmeans_fit's centroid collect.
    This removes, PER ITERATION: the weights-row broadcast join, the
    posexplode, the (dim)-keyed shuffle, the collect_list/array_sort
    re-assembly, the two 1-row broadcast joins of the update arithmetic,
    and the eager lineage checkpoint (its blocking job included) — the
    per-iteration plan goes from 5 joins + 2 aggregates to 1 aggregate,
    and jobs per iteration from 2 to 1. The update arithmetic is the
    identical IEEE-double expression evaluated in Python instead of the
    JVM; the per-dim gradient sums are the same partial+final double
    sums (grouped-by-dim before, one buffer per dim now), so the fit
    stays deterministic and the numpy single-step parity test holds
    unchanged. Measured (sf0.1, q_classifier_fit end-to-end,
    interleaved min-of-5): 4.47 -> 1.29 s."""
    # Materialize the (features, label) projection ONCE: every GD
    # iteration re-scans `vecs`, and without a barrier each iteration
    # re-evaluates the upstream scan + feature expressions (10 iters =
    # 10 feature passes). On a cluster this is the cached training set.
    spark = df.sparkSession
    vecs = df.select(
        F.col(features_col).alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
    ).localCheckpoint(eager=False)
    # One count job up front (the old code recomputed this 1-row
    # aggregate inside every iteration's plan instead).
    n = float(vecs.count())
    w = [0.0] * dim
    # Parsed-expr face of the iteration plan (r17, the LSH/SimHash
    # treatment): the Column-object construction — 8 weight literals,
    # the zip_with/aggregate dot-product HOF with Python lambdas, and
    # dim sum aggregates — cost ~0.18 s of py4j round trips PER
    # ITERATION; one selectExpr string + dim parsed aggregates build
    # the identical trees JVM-side (per-iteration 0.36 -> 0.18 s
    # measured, gradients collect-compared EQUAL — _dlit round-trips
    # each weight exactly and constant-folds to the same double
    # literal, and `__x[j]` is the same 0-based GetArrayItem).
    for _ in range(iters if n else 0):
        arr = ", ".join(_dlit(x) for x in w)
        resid_sql = (
            f"(1.0D / (1.0D + exp(-aggregate(zip_with(array({arr}), __x, "
            f"(a, b) -> a * b), 0.0D, (acc, v) -> acc + v)))) - __y"
        )
        grad_row = (
            vecs.selectExpr("__x", f"({resid_sql}) AS __r")
            .agg(*[F.expr(f"sum(__r * __x[{j}]) AS g{j}") for j in range(dim)])
            .collect()[0]
        )
        # index-aware update: feature 0 is the folded-in bias and is
        # NEVER L2-penalized — shrinking the intercept toward 0
        # miscalibrates the decision threshold (standard logreg
        # regularization excludes the intercept)
        w = [
            w[j]
            - lr * ((grad_row[f"g{j}"] or 0.0) / n + (l2 * w[j] if j >= 1 else 0.0))
            for j in range(dim)
        ]
    return spark.range(1).select(
        F.array(*[F.lit(x) for x in w]).alias("w")
    )


def logreg_predict(
    df: DataFrame, weights: DataFrame, features_col: str, out_col: str = "prob"
) -> DataFrame:
    """Attach P(label=1) via one broadcast of the 1-row weights — scoring
    is a codegen'd dot product at scan speed, zero shuffles."""
    return (
        df.join(F.broadcast(weights))
        .withColumn(out_col, _sigmoid(_dot(F.col("w"), F.col(features_col))))
        .drop("w")
    )
