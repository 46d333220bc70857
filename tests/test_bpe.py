"""Trainable BPE tokenizer (operators/bpe.py): merge-table sanity on a
planted corpus, encoder equivalence with sequential merge application
(the classic train/encode consistency property), determinism, and
monotone compression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.bpe import (
    END,
    _merge_once,
    _symbols,
    bpe_encode,
    bpe_train,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """'the' dominates; 'cat'/'hat' share the 'at' pair."""
    rows = [
        (i, "the cat sat on the mat with the hat and the bat")
        for i in range(30)
    ] + [(100 + i, "some other words appear here too") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def merges(spark, corpus):
    return bpe_train(corpus, n_merges=12).localCheckpoint(eager=True)


def test_frequent_word_fully_merges(spark, corpus, merges):
    """'the' is by far the most frequent word, so within 12 merges the
    learned table must tokenize it as the single symbol 'the</w>'."""
    enc = bpe_encode(
        spark.createDataFrame([(0, "the")], "doc_id long, text string"),
        merges,
    ).first()
    assert enc.bpe_tokens == [f"the{END}"]


def test_encoder_matches_sequential_merge_application(
    spark, corpus, merges
):
    """Applying the learned merges IN RANK ORDER to a word's symbols
    (the trainer's own rewrite) must equal the greedy lowest-rank
    encoder — the standard consistency property of a BPE merge table.
    Checked over every distinct corpus word."""
    words = corpus.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).distinct()
    seq = words.withColumn("syms", _symbols(F.col("word")))
    for r in sorted(merges.collect(), key=lambda r: r.rank):
        seq = seq.withColumn(
            "syms",
            _merge_once(F.col("syms"), F.lit(r.left), F.lit(r.right)),
        ).localCheckpoint(eager=False)
    want = {r.word: list(r.syms) for r in seq.collect()}
    got_rows = bpe_encode(
        words.withColumnRenamed("word", "text"), merges, text_col="text"
    ).collect()
    got = {r.text: list(r.bpe_tokens) for r in got_rows}
    assert got == want


def test_local_trainer_matches_distributed_fallback(spark, corpus):
    """The driver-local merge loop (the default path) and the
    one-Spark-job-per-merge distributed fallback must learn the SAME
    merge table — same pairs, same ranks. max_driver_vocab=0 forces
    the fallback; the r6->r7 restructure is only sound if this parity
    holds on a corpus with tie-breaks and overlapping pairs."""
    local = [
        (r.rank, r.left, r.right)
        for r in bpe_train(corpus, n_merges=12).collect()
    ]
    dist = [
        (r.rank, r.left, r.right)
        for r in bpe_train(
            corpus, n_merges=12, max_driver_vocab=0
        ).collect()
    ]
    assert local == dist and len(local) == 12


def test_local_trainer_handles_overlapping_pairs(spark):
    """'aaaa' stresses overlap accounting: the pair (a,a) counts every
    adjacent occurrence, but the greedy rewrite merges non-overlapping
    left-to-right. Local and distributed paths must agree exactly."""
    df = spark.createDataFrame(
        [(0, "aaaa aaaa aa baa aab")], "doc_id long, text string"
    )
    local = [
        (r.rank, r.left, r.right)
        for r in bpe_train(df, n_merges=6).collect()
    ]
    dist = [
        (r.rank, r.left, r.right)
        for r in bpe_train(df, n_merges=6, max_driver_vocab=0).collect()
    ]
    assert local == dist


def test_production_vocabulary_trains_in_one_job(spark, corpus):
    """n_merges=500 must NOT schedule O(n_merges) Spark jobs: the only
    distributed work is the word-count aggregate (+ the count guard),
    and the whole training call finishes in seconds. The merge loop
    exhausts this tiny corpus early and stops — also asserted."""
    import time

    t0 = time.time()
    m = bpe_train(corpus, n_merges=500).collect()
    elapsed = time.time() - t0
    assert elapsed < 30, f"driver-local training took {elapsed:.1f}s"
    # the corpus exhausts well before 500 merges (best pair count < 2)
    assert 12 <= len(m) < 500
    ranks = [r.rank for r in m]
    assert ranks == list(range(len(m)))


def test_training_is_deterministic(spark, corpus):
    a = [(r.rank, r.left, r.right) for r in bpe_train(corpus, n_merges=8).collect()]
    b = [(r.rank, r.left, r.right) for r in bpe_train(corpus, n_merges=8).collect()]
    assert a == b and len(a) == 8


def test_more_merges_never_grow_token_count(spark, corpus):
    def total(n):
        m = bpe_train(corpus, n_merges=n)
        return (
            bpe_encode(corpus, m)
            .select(F.sum(F.size("bpe_tokens")).alias("n"))
            .first()
            .n
        )

    t4, t12 = total(4), total(12)
    assert t12 < t4  # merges strictly compress this corpus
