"""Weighted sampling (operators/ids.py:weighted_sample) and the bigram
LM gate (operators/text.py:bigram_logprob): determinism, statistical
bias of the A-ES keys, hand-computed LM scores, and the
order-sensitivity property the unigram gate lacks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.ids import weighted_sample
from kafka_map_reduce_spark.operators.text import (
    bigram_logprob,
    unigram_logprob,
)


# ---------------------------------------------------------------- sampling


@pytest.fixture(scope="module")
def weighted_rows(spark):
    # ids 0..999: even ids weight 10, odd ids weight 1
    return spark.createDataFrame(
        [(i, 10 if i % 2 == 0 else 1) for i in range(1000)],
        "doc_id long, w long",
    )


def test_weighted_sample_is_deterministic_and_partition_stable(
    spark, weighted_rows
):
    a = [r.doc_id for r in weighted_sample(weighted_rows, 50, "w").collect()]
    b = [
        r.doc_id
        for r in weighted_sample(
            weighted_rows.repartition(13), 50, "w"
        ).collect()
    ]
    assert sorted(a) == sorted(b) and len(a) == 50


def test_weighted_sample_tracks_weights(spark, weighted_rows):
    """Half the rows carry 10x the weight; the A-ES sample must be
    dominated by them (expected heavy share ~10/11; the deterministic
    hash draw fixes the outcome, so the assertion is exact-repeatable,
    not flaky)."""
    got = weighted_sample(weighted_rows, 100, "w").collect()
    heavy = sum(1 for r in got if r.doc_id % 2 == 0)
    assert heavy >= 80


def test_weighted_sample_zero_weight_never_selected(spark):
    df = spark.createDataFrame(
        [(i, 0 if i < 500 else 1) for i in range(1000)],
        "doc_id long, w long",
    )
    got = weighted_sample(df, 400, "w").collect()
    assert all(r.doc_id >= 500 for r in got)
    # and the clamp keeps keys finite (no NaN ranking first)
    assert all(not math.isnan(r.es_key) for r in got)


def test_weighted_sample_matches_python_replay(spark):
    """The full A-ES pipeline replayed in pure Python (salted md5 ->
    uniform -> ln(u)/w -> top-k) must pick the identical id set — the
    cross-engine reproducibility contract the operator exists for."""
    import hashlib

    rows = [(i, 1 + (i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        r.doc_id for r in weighted_sample(df, 25, "w").collect()
    )

    def key(i, w):
        h = int(hashlib.md5(f"wsamp:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967297.0
        return math.log(u) / w

    want = sorted(
        i
        for i, _ in sorted(
            rows, key=lambda t: (-key(t[0], t[1]), t[0])
        )[:25]
    )
    assert got == want


# ---------------------------------------------------------------- bigram LM


def test_bigram_logprob_hand_computed(spark):
    """Tiny corpus where the LM is computable by hand: docs 'a b a b'
    and 'a c'. Bigrams: (a,b)x2, (b,a)x1, (a,c)x1; c(a.)=3, c(b.)=1,
    V=3 (a,b,c), k=0.5."""
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.mean_logprob)
        for r in bigram_logprob(df).collect()
    }
    v = 3.0
    p_ab = (2 + 0.5) / (3 + 0.5 * v)
    p_ba = (1 + 0.5) / (1 + 0.5 * v)
    p_ac = (1 + 0.5) / (3 + 0.5 * v)
    want0 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    want1 = math.log(p_ac)
    assert got[0][0] == 3 and got[1][0] == 1
    assert got[0][1] == pytest.approx(want0, abs=1e-9)
    assert got[1][1] == pytest.approx(want1, abs=1e-9)


def test_bigram_gate_sees_scrambled_order_unigram_cannot(spark):
    """The property that justifies the order-2 gate: a document whose
    tokens are individually common but whose TRANSITIONS never occur in
    the corpus scores far below its in-order twin on the bigram gate,
    while the unigram gate rates both identically."""
    fluent = "the cat sat on the mat and the dog ran to the cat"
    # same multiset of tokens, adversarially reordered
    scrambled = "cat the on sat mat the dog and ran the to cat the"
    corpus = [(i, fluent) for i in range(20)] + [(100, scrambled)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    uni = {r.doc_id: r.mean_logprob for r in unigram_logprob(df).collect()}
    assert uni[100] == pytest.approx(uni[0], abs=1e-9)  # blind

    bi = {r.doc_id: r.mean_logprob for r in bigram_logprob(df).collect()}
    assert bi[100] < bi[0] - 1.0  # the order-2 gate separates them


def test_bigram_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "two tokens")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in bigram_logprob(df).collect()}
    assert got == {2}


def _train_lm12(spark):
    """(w1, w2, cnt12) LM table for 'a b a b' + 'a c': (a,b)x2, (b,a)x1,
    (a,c)x1; LM vocab = {a, b, c}, V = 3."""
    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id long, text string"
    )
    from kafka_map_reduce_spark.operators.text import tokens

    base = train.select(tokens(F.col("text")).alias("ts"))
    bi = base.filter(F.size("ts") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    return bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt12"))


def test_bigram_fixed_lm_scores_new_batch(spark):
    """Production shape: train the LM once, score a new batch against
    it. The model alone defines the score: V is the LM vocabulary
    ({a,b,c} = 3, NOT the batch's). A pair absent from the LM keeps
    its CONTEXT count when w1 is in the model (r8 ADVICE fix): (b,z)
    scores cnt12=0 against c(b·)=1 — ln(k/(c(b·)+kV)) — not the
    context-blind ln(1/V) floor. A seen pair gets the model's folded
    context count."""
    lm12 = _train_lm12(spark)
    batch = spark.createDataFrame(
        [(7, "b z"), (8, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bigram_logprob(batch, lm_bigrams=lm12).collect()}
    assert got[7].n_bigrams == 1 and got[8].n_bigrams == 1
    # (b,z) unseen pair, seen context: cnt12=0, recovered c(b.)=1
    assert got[7].mean_logprob == pytest.approx(
        math.log(0.5 / (1 + 0.5 * 3)), abs=1e-9
    )
    # (a,b) seen: cnt12=2, folded cnt1 = c(a.) = 3
    assert got[8].mean_logprob == pytest.approx(
        math.log((2 + 0.5) / (3 + 0.5 * 3)), abs=1e-9
    )


def test_bigram_fixed_lm_unseen_context_is_uniform_floor(spark):
    """A context absent from the model ENTIRELY (w1='z') has
    c(z·)=0: the smoothed conditional is the uniform k/(kV) = 1/V —
    the only case that floor is correct for, and now the only case
    that reaches it."""
    lm12 = _train_lm12(spark)
    batch = spark.createDataFrame([(7, "z q")], "doc_id long, text string")
    got = bigram_logprob(batch, lm_bigrams=lm12).collect()[0]
    assert got.mean_logprob == pytest.approx(math.log(1.0 / 3.0), abs=1e-9)


def test_bigram_fixed_lm_frequent_context_scores_below_rare(spark):
    """The ranking property the r8 ADVICE flagged: an unseen
    transition out of a FREQUENT context (c(a·)=3) must score lower
    than one out of a rare context (c(b·)=1) — before the fix both
    collapsed to ln(1/V) and the gate could not tell them apart."""
    lm12 = _train_lm12(spark)
    batch = spark.createDataFrame(
        [(1, "a z"), (2, "b z")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.mean_logprob
        for r in bigram_logprob(batch, lm_bigrams=lm12).collect()
    }
    assert got[1] == pytest.approx(math.log(0.5 / (3 + 1.5)), abs=1e-9)
    assert got[2] == pytest.approx(math.log(0.5 / (1 + 1.5)), abs=1e-9)
    assert got[1] < got[2]


def test_bigram_fixed_lm_context_mass_sums_to_one(spark):
    """Proper-conditional-distribution claim, verified numerically:
    for a context in the model (w1='a', c(a·)=3, V=3), the smoothed
    probabilities of ALL V continuations sum to 1 — seen (b: 2, c: 1)
    and unseen (a: 0) alike."""
    lm12 = _train_lm12(spark)
    batch = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a a")], "doc_id long, text string"
    )
    got = {
        r.doc_id: math.exp(r.mean_logprob)
        for r in bigram_logprob(batch, lm_bigrams=lm12).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_bigram_fixed_lm_batch_independent(spark):
    """Reproducibility contract (r7 ADVICE): under a fixed LM the same
    document scores identically whether it rides alone or with other
    documents in the batch — V comes from the model, not the batch."""
    lm12 = _train_lm12(spark)
    solo = spark.createDataFrame([(7, "b z")], "doc_id long, text string")
    crowd = spark.createDataFrame(
        [(7, "b z"), (9, "p q r s t u v w x y zz")],
        "doc_id long, text string",
    )
    s1 = bigram_logprob(solo, lm_bigrams=lm12).collect()[0].mean_logprob
    s2 = {
        r.doc_id: r.mean_logprob
        for r in bigram_logprob(crowd, lm_bigrams=lm12).collect()
    }[7]
    assert s1 == pytest.approx(s2, abs=1e-12)


def test_bigram_fixed_lm_explicit_vocab_size(spark):
    """vocab_size overrides the LM-derived V (e.g. the persisted model
    records its training vocabulary, wider than its surviving bigrams)."""
    lm12 = _train_lm12(spark)
    batch = spark.createDataFrame([(8, "a b")], "doc_id long, text string")
    got = bigram_logprob(batch, lm_bigrams=lm12, vocab_size=10.0).collect()[0]
    assert got.mean_logprob == pytest.approx(
        math.log((2 + 0.5) / (3 + 0.5 * 10)), abs=1e-9
    )
