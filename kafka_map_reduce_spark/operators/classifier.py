"""Distributed logistic regression — the trainable quality gate.

Production corpus builds grade documents with a learned classifier
(fastText in GPT-3/LLaMA's pipeline: train on a seed of known-good vs
known-bad docs, keep what scores well), not only with the fixed
heuristics of operators/text.py. The reference has no ML surface at all
(its compute stops at the four pipeline stages, lib.rs:235-383); this is
part of the engine's Tier-C training-data extensions.

Spark-first design, same pattern as similarity.kmeans_fit: model state
lives in a ONE-ROW DataFrame that rides along as a broadcast join —
never on the driver, never a shuffle wider than (dim, double). Full-batch
gradient descent; each iteration is
  - one broadcast join to attach the weights row,
  - one posexplode + (dim) hash aggregate for the gradient (map-side
    partial aggregation collapses it to dims x partitions rows),
  - a 1-row arithmetic update, localCheckpoint'ed to truncate lineage.
Fixed iteration count + deterministic init => bit-deterministic fits.

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

    grad_j = mean((sigmoid(w.x) - y) * x_j) + l2 * w_j for j >= 1 (the
    bias at j = 0 is exempt from the penalty); the mean keeps
    ``lr`` corpus-size-independent. ``dim`` is explicit (not probed from
    the data) so the init is a pure literal and the fit plan never runs
    a row-sampling job.

    Scale: the gradient aggregate is the ONLY data-sized stage per
    iteration, and map-side partial aggregation reduces it to
    dim x partitions narrow rows; everything else is 1-row state. The
    same shape at 1000 executors: one broadcast, one treeish aggregate,
    no driver round-trip."""
    # Materialize the (features, label) projection ONCE: every GD
    # iteration joins `vecs`, and without a barrier each iteration
    # re-evaluates the upstream scan + feature expressions (10 iters =
    # 10 feature passes). On a cluster this is the cached training set.
    vecs = df.select(
        F.col(features_col).alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
    ).localCheckpoint(eager=False)
    w = df.sparkSession.range(1).select(
        F.array(*[F.lit(0.0) for _ in range(dim)]).alias("w")
    )
    n_row = vecs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    for _ in range(iters):
        resid = (
            vecs.join(F.broadcast(w))
            .withColumn("__p", _sigmoid(_dot(F.col("w"), F.col("__x"))))
            .select(
                F.posexplode(
                    F.transform(
                        F.col("__x"), lambda x: (F.col("__p") - F.col("__y")) * x
                    )
                ).alias("__j", "__g")
            )
        )
        grad = (
            resid.groupBy("__j")
            .agg(F.sum("__g").alias("__s"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__j", "__s"))),
                    lambda s: s["__s"],
                ).alias("__grad")
            )
        )
        w = (
            w.join(F.broadcast(grad))
            .join(F.broadcast(n_row))
            .select(
                # index-aware update: feature 0 is the folded-in bias and
                # is NEVER L2-penalized — shrinking the intercept toward 0
                # miscalibrates the decision threshold (standard logreg
                # regularization excludes the intercept)
                F.transform(
                    F.arrays_zip("w", "__grad"),
                    lambda s, i: s["w"]
                    - F.lit(lr)
                    * (
                        s["__grad"] / F.col("__n")
                        + F.when(i >= 1, F.lit(l2) * s["w"]).otherwise(
                            F.lit(0.0)
                        )
                    ),
                ).alias("w")
            )
            # truncate the per-iteration lineage growth (kmeans_fit pattern)
            .localCheckpoint(eager=True)
        )
    return w


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
