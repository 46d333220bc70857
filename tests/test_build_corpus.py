"""End-to-end corpus build (tools/build_corpus.py): the full composition
documents → dedup/gates/redact/chunk → packing → shards on disk."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from build_corpus import build_corpus  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_build_matches_flagship_and_layout(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stats = build_corpus(spark, SF_DIR, out, rows_per_shard=16)

    from kafka_map_reduce_spark.registry import all_queries

    flagship = all_queries()["q_pipeline_e2e"].fn(spark, SF_DIR)
    n_chunks = flagship.count()
    assert stats["n_chunks"] == n_chunks
    assert stats["n_shards"] == (n_chunks + 15) // 16

    # the written shards ARE the flagship rows (same chunk_md5 multiset)
    written = spark.read.parquet(out)
    assert written.count() == n_chunks
    diff = (
        written.select("doc_id", "chunk_id", "chunk_md5")
        .exceptAll(flagship.select("doc_id", "chunk_id", "chunk_md5"))
        .count()
    )
    assert diff == 0

    # packing invariant: cum_before is the exclusive prefix sum of
    # n_tokens in (doc_id, chunk_id) order
    rows = written.orderBy("doc_id", "chunk_id").collect()
    acc = 0
    for r in rows:
        assert r.cum_before == acc
        assert r.seq_id == acc // 512
        acc += r.n_tokens
    assert stats["total_tokens"] == acc

    # manifest exists and addresses every shard
    manifest = spark.read.parquet(os.path.join(out, "_manifest"))
    assert manifest.count() == stats["n_shards"]
    assert manifest.agg(F.sum("n_rows")).collect()[0][0] == n_chunks


def test_split_assignment_is_doc_keyed(spark, tmp_path):
    """Every chunk of a document carries the SAME split (no eval leakage
    through chunk boundaries), splits match the registered q_split_assign
    expression, and the stats report covers all chunks."""
    out = str(tmp_path / "corpus_split")
    stats = build_corpus(spark, SF_DIR, out, rows_per_shard=16)
    written = spark.read.parquet(os.path.join(out, "shard=*"))
    per_doc = written.groupBy("doc_id").agg(
        F.count_distinct("split").alias("k")
    )
    assert per_doc.filter(F.col("k") != 1).count() == 0
    from kafka_map_reduce_spark.operators.ids import hash_split

    expect = written.select("doc_id", "split").distinct().withColumn(
        "__expect", hash_split(F.col("doc_id"))[1]
    )
    assert expect.filter(F.col("split") != F.col("__expect")).count() == 0
    assert sum(stats["chunks_per_split"].values()) == stats["n_chunks"]
