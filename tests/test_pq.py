"""Product quantization (operators/similarity.py pq_*): codebook shape,
encode-argmin correctness, ADC exactness vs reconstruction, recall floor.

PQ is approximate by construction (the corpus is replaced by per-subspace
centroid codes), so like the other rows-only operators its guarantee
lives here as a pinned floor vs the exact metric it approximates
(squared L2 — ADC estimates distance to the RECONSTRUCTED corpus vector,
so the reference ranking is exact L2, not cosine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.similarity import (
    pq_encode,
    pq_fit,
    pq_topk,
)

SF_DIR = "/root/testdata/sf0.001"
M, N_CODES = 4, 16


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def books(spark, emb):
    return pq_fit(emb, m=M, n_codes=N_CODES, iters=3).localCheckpoint(eager=True)


def test_codebook_shape(books):
    rows = books.collect()
    assert {r.subspace for r in rows} == set(range(M))
    # clusters may collapse but never exceed n_codes, and every centroid
    # spans exactly the subspace dims
    per_sub = {}
    for r in rows:
        per_sub.setdefault(r.subspace, []).append(r)
        assert len(r.centroid) == 64 // M
    assert all(1 <= len(v) <= N_CODES for v in per_sub.values())


def test_codes_are_nearest_centroids(emb, books):
    d_sub = 64 // M
    book = {}
    for r in books.collect():
        book.setdefault(r.subspace, {})[r.cluster_id] = list(r.centroid)
    enc = {r.id: list(r.codes) for r in pq_encode(emb, books, m=M).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.limit(25).collect()}
    for vid, v in vecs.items():
        for j in range(M):
            sub = [float(x) for x in v[j * d_sub : (j + 1) * d_sub]]
            dists = {
                cid: sum((a - b) ** 2 for a, b in zip(sub, c))
                for cid, c in book[j].items()
            }
            best = min(dists, key=lambda c: (dists[c], c))
            assert enc[vid][j] == best, f"vec {vid} subspace {j}"


def test_adc_distance_is_reconstruction_distance(emb, books):
    d_sub = 64 // M
    book = {}
    for r in books.collect():
        book.setdefault(r.subspace, {})[r.cluster_id] = list(r.centroid)
    enc = {r.id: list(r.codes) for r in pq_encode(emb, books, m=M).collect()}
    probes = emb.filter("vec_id < 3")
    got = pq_topk(probes, pq_encode(emb, books, m=M), books, k=5, m=M).collect()
    pvecs = {r.vec_id: [float(x) for x in r.embedding] for r in probes.collect()}
    for r in got:
        p = pvecs[r.probe_id]
        expect = 0.0
        for j in range(M):
            sub = p[j * d_sub : (j + 1) * d_sub]
            cent = book[j][enc[r.neighbor_id][j]]
            expect += sum((a - b) ** 2 for a, b in zip(sub, cent))
        # ranked_topk floor-rounds sim to 4 decimals (oracle convention)
        import math

        assert r.sim == pytest.approx(
            math.floor(-expect * 10000 + 0.5) / 10000, abs=1e-12
        )


def test_pq_recall_floor_vs_exact_l2(spark, emb, books):
    """Re-ranked recall@10 vs exact squared-L2 top-10 >= 0.70 (m=4, 16
    codes, shortlist=100) on the 64-dim fixture embeddings.

    These vectors are near-random — the PQ-hostile case with no cluster
    structure for codebooks to exploit — so plain ADC recall@10 is only
    0.21-0.37 across m/code sweeps (measured m=4..16, 16-32 codes).
    The pinned guarantee is therefore the production configuration:
    ADC shortlist + exact re-rank of the original vectors (the
    candidate-sized semi-join path in pq_topk), which holds 0.75 here.
    The other three tests pin exactness of the machinery itself
    (argmin codes, ADC = reconstruction distance), so this floor is
    purely about quantization loss, not implementation drift."""
    k = 10
    probes = emb.filter("vec_id < 10")
    corpus = emb.filter("vec_id >= 10")

    p = probes.select(
        F.col("vec_id").alias("probe_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("pv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    exact = (
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
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("probe_id")
                .orderBy(F.col("d").asc(), F.col("neighbor_id"))
            ),
        )
        .filter(F.col("rk") <= k)
        .collect()
    )
    approx = pq_topk(
        probes,
        pq_encode(corpus, books, m=M),
        books,
        k=k,
        m=M,
        rerank_corpus=corpus,
        shortlist=100,
    ).collect()

    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[p_] & approx_sets.get(p_, set())) / len(exact_sets[p_])
        for p_ in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.70, f"PQ mean recall@10 {mean_recall:.2f} < 0.70"
