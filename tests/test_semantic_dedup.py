"""SemDeDup-shape semantic dedup (operators/similarity.py:
semantic_dedup): planted-pair recall at a SEMANTIC threshold, the
cluster-bounded candidate property, the hot-cluster governor, and
determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    semantic_dedup,
)

DIM = 16


def _vec(center: list[float], eps: float, j: int) -> list[float]:
    """Deterministic small perturbation of a center vector."""
    return [
        c + eps * math.sin(7.0 * j + 13.0 * i)
        for i, c in enumerate(center)
    ]


@pytest.fixture(scope="module")
def planted(spark):
    """Four well-separated centers (axis blocks), 30 vectors each with
    tiny perturbations: every same-center pair is a semantic near-dup
    (cosine >> 0.85), every cross-center pair is far below."""
    import itertools

    centers = []
    for b in range(4):
        c = [0.0] * DIM
        for i in range(4):
            c[b * 4 + i] = 1.0
        centers.append(c)
    rows = []
    vid = 0
    for b, c in enumerate(centers):
        for j in range(30):
            rows.append((vid, b, _vec(c, 0.02, j)))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, center int, embedding array<double>"
    )


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_recall_on_planted_clusters(spark, planted):
    """Every same-center pair must be found (they are dense near-dups
    and k-means with k=4 separates the centers), no cross-center pair
    may appear (cosine far below threshold — precision is exact by
    construction)."""
    got = semantic_dedup(
        planted.select("vec_id", "embedding"),
        threshold=0.85,
        n_clusters=4,
        iters=3,
    )
    pairs = _pairs(got)
    want = set()
    centers = {r.vec_id: r.center for r in planted.collect()}
    ids = sorted(centers)
    for a in ids:
        for b in ids:
            if a < b and centers[a] == centers[b]:
                want.add((a, b))
    assert pairs == want  # full recall AND exact precision
    assert len(pairs) == 4 * (30 * 29 // 2)


def test_semantic_threshold_band_beyond_lsh(spark, planted):
    """The modality's reason to exist: at threshold 0.85 the planted
    same-center sims actually occupy the sub-0.95 band hyperplane LSH
    can't reach reliably — verify the fixture exercises that band."""
    e = planted.select("vec_id", "embedding")
    a = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("va")
    )
    b = e.filter((F.col("vec_id") > 0) & (F.col("vec_id") < 30)).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
    )
    sims = [
        r.s
        for r in a.crossJoin(b)
        .select(cosine(F.col("va"), F.col("vb")).alias("s"))
        .collect()
    ]
    assert min(sims) >= 0.85  # all pairs are dups at the band floor


def test_candidates_are_cluster_bounded(spark, planted):
    """No cross-cluster comparison exists: with the threshold dropped to
    -1 every emitted pair would survive, so the pair count IS the
    candidate count — it must equal sum c_i*(c_i-1)/2, not N*(N-1)/2."""
    got = semantic_dedup(
        planted.select("vec_id", "embedding"),
        threshold=-1.0,
        n_clusters=4,
        iters=3,
    )
    n = got.count()
    assert n == 4 * (30 * 29 // 2)  # 1740, not 120*119/2 = 7140


def test_hot_cluster_cap_routes_out(spark, planted):
    """max_cluster_size below the planted cluster size drops every
    cluster from the quadratic join (the template-blob governor)."""
    got = semantic_dedup(
        planted.select("vec_id", "embedding"),
        threshold=0.85,
        n_clusters=4,
        iters=3,
        max_cluster_size=10,
    )
    assert got.count() == 0


def test_deterministic(spark, planted):
    e = planted.select("vec_id", "embedding")
    a = _pairs(semantic_dedup(e, threshold=0.85, n_clusters=4, iters=3))
    b = _pairs(semantic_dedup(e, threshold=0.85, n_clusters=4, iters=3))
    assert a == b


def test_agrees_with_brute_force_topk_neighbors(spark, planted):
    """Cross-check against the exact engine face: for a probe vector,
    its brute-force top-5 neighbors (excluding itself) are all
    same-center — and semantic_dedup reports each of those pairs."""
    e = planted.select("vec_id", "embedding")
    probe = e.filter(F.col("vec_id") == 0)
    top = brute_force_topk(probe, e.filter(F.col("vec_id") != 0), k=5)
    neigh = {r.neighbor_id for r in top.collect()}
    assert neigh <= set(range(1, 30))
    pairs = _pairs(semantic_dedup(e, threshold=0.85, n_clusters=4, iters=3))
    for nb in neigh:
        assert (0, nb) in pairs
