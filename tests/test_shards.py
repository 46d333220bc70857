"""Training-shard writer (operators/shards.py): size caps, global order,
manifest addressing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.shards import read_shard, write_shards


@pytest.fixture()
def docs(spark):
    # shuffled input: shard layout must come from the order key, not
    # physical order
    return (
        spark.range(1000)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"),
        )
        .orderBy("text")
        .repartition(13)
    )


def test_shard_sizes_and_manifest(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_shards(docs, out, ["doc_id"], rows_per_shard=128)
    rows = manifest.orderBy("shard").collect()
    assert [r.shard for r in rows] == list(range(8))  # ceil(1000/128)
    assert [r.n_rows for r in rows] == [128] * 7 + [104]
    assert rows[0].first_id == 1 and rows[-1].last_id == 1000
    # contiguous, non-overlapping ranges
    for a, b in zip(rows, rows[1:]):
        assert b.first_id == a.last_id + 1


def test_shard_contents_follow_order_key(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, ["doc_id"], rows_per_shard=256)
    s1 = read_shard(spark, out, 1).orderBy("sample_id").collect()
    # shard 1 = global ranks 257..512 = doc_ids 256..511 (rank follows doc_id)
    assert [r.doc_id for r in s1] == list(range(256, 512))
    assert [r.sample_id for r in s1] == list(range(257, 513))


def test_read_shard_prunes_partitions(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, ["doc_id"], rows_per_shard=100)
    plan = read_shard(spark, out, 3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan


def test_manifest_persisted(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, ["doc_id"], rows_per_shard=500)
    m = spark.read.parquet(os.path.join(out, "_manifest"))
    assert m.count() == 2


def test_rejects_bad_shard_size(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="rows_per_shard"):
        write_shards(docs, str(tmp_path / "x"), ["doc_id"], rows_per_shard=0)


def test_rerun_over_partial_output_is_idempotent(spark, docs, tmp_path):
    """A crashed writer leaves partial shard directories; a rerun must
    converge to the exact complete layout (mode=overwrite + the manifest
    written last acts as the commit marker: no _manifest -> not
    committed, rerun)."""
    import shutil

    out = str(tmp_path / "shards")
    write_shards(docs, out, ["doc_id"], rows_per_shard=128)
    good = {
        (r.shard, r.n_rows, r.first_id, r.last_id)
        for r in spark.read.parquet(os.path.join(out, "_manifest")).collect()
    }
    # simulate a crash: drop the manifest and one shard directory
    shutil.rmtree(os.path.join(out, "_manifest"))
    shutil.rmtree(os.path.join(out, "shard=3"))
    write_shards(docs, out, ["doc_id"], rows_per_shard=128)
    again = {
        (r.shard, r.n_rows, r.first_id, r.last_id)
        for r in spark.read.parquet(os.path.join(out, "_manifest")).collect()
    }
    assert again == good
    assert spark.read.parquet(out).count() == 1000
