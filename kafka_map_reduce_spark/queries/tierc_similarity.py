"""Tier C similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators import similarity as S
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table


@query(
    "q_sim_cosine",
    oracle="""
    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           floor((list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                   CAST(c.embedding AS DOUBLE[]))
                  / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                           CAST(p.embedding AS DOUBLE[])))
                     * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])))))
                 * 10000 + 0.5) / 10000 AS sim
    FROM embeddings p JOIN embeddings c ON p.vec_id < 10 AND c.vec_id >= 10
    """,
)
def q_sim_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity, pure JVM expression (zip_with + fold)."""
    e = load_table(spark, sf_dir, "embeddings")
    p = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
    )
    c = e.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    return c.crossJoin(F.broadcast(p)).select(
        "probe_id",
        "neighbor_id",
        (
            F.floor(S.cosine(F.col("pv"), F.col("cv")) * 10000 + F.lit(0.5)) / F.lit(10000)
        ).alias("sim"),
    )


@query(
    "q_sim_topk",
    oracle="""
    WITH scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                        CAST(p.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])))) AS raw_sim
        FROM embeddings p JOIN embeddings c ON p.vec_id < 20 AND c.vec_id >= 20
    )
    SELECT probe_id, neighbor_id,
           floor(raw_sim * 10000 + 0.5) / 10000 AS sim,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY raw_sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k nearest neighbors per probe (the ANN
    baseline): one corpus scan, broadcast probes, ranked window."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        e.filter(F.col("vec_id") < 20), e.filter(F.col("vec_id") >= 20), k=5
    )


@query("q_sim_ivf", oracle=None, tags=("approx",))
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: hyperplane-sign coarse quantizer (256
    buckets), probes search only their bucket — the 100 TB scale path."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        e.filter(F.col("vec_id") < 20), e.filter(F.col("vec_id") >= 20), k=5
    ).orderBy("probe_id", "rank")


@query("q_sim_ivf_kmeans", oracle=None, tags=("approx",))
def q_sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: Lloyd k-means (DataFrame
    ops only, centroids broadcast as one row, never collected) learns 8
    cells; probes search their 2 nearest cells. Versus q_sim_ivf's static
    hyperplane quantizer, trained cells track the data distribution —
    higher recall at the same scanned fraction. Iterative => no SQL
    oracle; determinism + recall are pytest-asserted (planted clusters)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.ivf_kmeans_topk(
        e.filter(F.col("vec_id") < 20), e.filter(F.col("vec_id") >= 20),
        k=5, n_clusters=8, iters=3, nprobe=2,
    ).orderBy("probe_id", "rank")
