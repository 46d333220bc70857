"""End-to-end corpus build CLI: documents → training shards on disk.

The composition a training-data user actually runs, wired from the
individually-verified operators: exact dedup (keep-min-id) → quality +
language gates → PII redaction → context-window chunking (the
q_pipeline_e2e plan, one shuffle) → packing manifest (running_total
prefix sums) → size-capped ordered shards with manifest addressing
(operators/shards.py). Prints one JSON line of corpus stats.

Usage:
    python tools/build_corpus.py [sf_dir] [out_dir] [rows_per_shard]

Defaults: /root/testdata/sf0.01 → <repo>/.corpus_out, 4096 rows/shard.
Also importable: ``build_corpus(spark, sf_dir, out_dir, rows_per_shard)``
returns the stats dict (pytest drives it this way).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_corpus(
    spark, sf_dir: str, out_dir: str, rows_per_shard: int = 4096
) -> dict:
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark.operators.ids import running_total
    from kafka_map_reduce_spark.operators.shards import write_shards
    from kafka_map_reduce_spark.registry import all_queries

    specs = all_queries()
    # Stage 1-4 in one plan: dedup → gates → redact → chunk. Reusing the
    # registered flagship keeps this CLI oracle-backed — the exact rows
    # written here are the rows the driver hash-checks every round.
    chunks = specs["q_pipeline_e2e"].fn(spark, sf_dir)
    # Stage 5: packing manifest over the chunk stream (chunk_id within
    # doc, doc_id as the outer order) — where each chunk lands in the
    # concatenated 512-token context windows.
    packed = running_total(
        chunks.select(
            "doc_id", "chunk_id", "chunk_md5", F.col("n_tokens").cast("long")
            .alias("n_tokens"),
        ),
        ["doc_id", "chunk_id"],
        "n_tokens",
        "cum_before",
    ).withColumn("seq_id", F.floor(F.col("cum_before") / F.lit(512)).cast("long"))
    # Stage 5b: deterministic train/val/test assignment (the registered
    # q_split_assign expression — keyed on doc_id, so every chunk of a
    # document lands in the same split and no eval text leaks into train
    # through a chunk boundary).
    from kafka_map_reduce_spark.operators.ids import hash_split

    packed = packed.withColumn("split", hash_split(F.col("doc_id"))[1])
    # Stage 6: size-capped ordered shards + manifest.
    manifest = write_shards(
        packed, out_dir, ["doc_id", "chunk_id"], rows_per_shard=rows_per_shard
    )
    agg = manifest.agg(
        F.count(F.lit(1)).alias("n_shards"), F.sum("n_rows").alias("n_chunks")
    ).collect()[0]
    tok = packed.agg(
        F.sum("n_tokens").alias("total_tokens"),
        (F.max(F.col("cum_before") + F.col("n_tokens") - 1) / 512).alias("seqs"),
    ).collect()[0]
    splits = {
        r.split: int(r.n)
        for r in packed.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "metric": "corpus_build",
        "sf_dir": sf_dir,
        "out_dir": out_dir,
        "rows_per_shard": rows_per_shard,
        "n_shards": agg.n_shards,
        "n_chunks": int(agg.n_chunks),
        "total_tokens": int(tok.total_tokens),
        "n_sequences_512": int(tok.seqs) + 1,
        "chunks_per_split": splits,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".corpus_out")
    rows_per_shard = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from kafka_map_reduce_spark import get_session

    spark = get_session(
        "build-corpus",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    print(json.dumps(build_corpus(spark, sf_dir, out_dir, rows_per_shard)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
