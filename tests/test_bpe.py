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
