"""Scalar quantization (operators/similarity.py sq8_*): quantizer shape,
code range/round-trip error bound, and recall floors vs exact L2.

SQ8 is approximate by construction (each dimension rounds to 256
levels), so like PQ its guarantee lives here as pinned floors against
the exact metric it approximates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark.sql import Window

from kafka_map_reduce_spark.operators.similarity import (
    sq8_encode,
    sq8_fit,
    sq8_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def quant(spark, emb):
    return sq8_fit(emb).localCheckpoint(eager=True)


def test_quantizer_shape_and_bounds(spark, emb, quant):
    row = quant.collect()[0]
    dim = emb.select(F.size("embedding").alias("d")).first().d
    assert len(row.lo) == dim and len(row.span) == dim
    assert all(s > 0 for s in row.span)
    # lo really is the per-dimension minimum
    mins = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("m"))
        .orderBy("pos")
        .collect()
    )
    for p, m in ((r.pos, r.m) for r in mins):
        assert abs(row.lo[p] - m) < 1e-9


def test_codes_in_range_and_roundtrip_error_bound(spark, emb, quant):
    """Every code in [0,255]; decoding must land within half a
    quantization step (span/510) of the original value per dimension."""
    enc = sq8_encode(emb, quant)
    bad = enc.select(
        F.size(F.filter("codes", lambda c: (c < 0) | (c > 255))).alias("n")
    ).agg(F.sum("n").alias("n")).first().n
    assert bad == 0
    err = (
        emb.join(enc, emb.vec_id == enc.id)
        .join(F.broadcast(quant))
        .select(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.expr(
                        "transform(codes, (c, i) -> lo[i] + c / 255.0 * span[i])"
                    ),
                    lambda x, d: F.abs(x.cast("double") - d),
                ),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            ).alias("maxerr"),
            F.aggregate(
                "span", F.lit(0.0), lambda acc, s: F.greatest(acc, s)
            ).alias("maxspan"),
        )
        .agg(
            F.max("maxerr").alias("err"), F.max("maxspan").alias("span")
        )
        .first()
    )
    assert err.err <= err.span / 510 + 1e-9, (err.err, err.span)


@pytest.mark.parametrize("rerank,floor", [(False, 0.80), (True, 0.95)])
def test_recall_floor_vs_exact_l2(spark, emb, quant, rerank, floor):
    """256 levels/dim loses little: plain SQ8 recall@10 >= 0.80 and the
    shortlist-50 exact re-rank >= 0.95 on the fixture embeddings."""
    corpus = emb.filter("vec_id >= 10")
    probes = emb.filter("vec_id < 10")
    p = probes.select(
        F.col("vec_id").alias("probe_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("pv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    truth = {
        (r.probe_id, r.neighbor_id)
        for r in (
            c.join(F.broadcast(p))
            .withColumn(
                "d",
                F.aggregate(
                    F.zip_with("pv", "cv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("probe_id").orderBy(
                        F.col("d").asc(), F.col("neighbor_id")
                    )
                ),
            )
            .filter(F.col("rk") <= 10)
            .collect()
        )
    }
    enc = sq8_encode(corpus, quant)
    got = {
        (r.probe_id, r.neighbor_id)
        for r in sq8_topk(
            probes,
            enc,
            quant,
            k=10,
            rerank_corpus=corpus if rerank else None,
            shortlist=50,
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= floor, f"SQ8 recall@10 {recall:.2f} < {floor}"
