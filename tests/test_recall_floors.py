"""Recall / accuracy floors for the rows-only (no-SQL-oracle) operators.

The driver's differential harness can only rows-check approximate and
hash-seed-dependent queries (SURVEY §2.2's rows-only rows), so their
quality guarantees live here: deterministic planted-truth corpora with
explicit floors. Everything is seed-free-deterministic — doc/vector
content derives from ids and xxhash64 is a fixed function — so a floor
that passes once passes always; a failure means the operator changed.

Floors asserted (mirrored in SURVEY §2.2 annotations):
- MinHash-LSH (64 perm / 16 bands, threshold 0.5): >= 95% of planted
  pairs at true Jaccard >= 0.7 across a 3-level overlap sweep
  (theoretical per-pair candidate prob at s=0.71 is 1-(1-s^4)^16 ~ 0.99).
- IVF-kmeans ANN (nprobe=2 of 4): recall@10 vs brute force >= 0.70 on
  OVERLAPPING clusters (beyond the separated-cluster bijection test).
- approx_count_distinct(rsd=0.01 — the q_agg_approx_distinct setting):
  relative error <= 3*rsd on a 100k-distinct column.
- percentile_approx(accuracy=1000 — the q_sketch_quantile setting): rank
  error <= 1/accuracy of the group size at every checked quantile.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_lsh_recall_floor_across_overlap_sweep(spark):
    """>= 95% of planted near-dup pairs recovered at the declared 0.5
    threshold, swept over three overlap levels all above Jaccard ~0.7.

    Corpus: 600 organic 20-word docs (words derived from doc_id — no
    accidental near-dups), plus 60 planted clones (20 per level) with the
    first c in {1,2,3} words rewritten. With k=3 shingles a 20-word doc
    has 18 shingles and changing the first c words replaces c shingles,
    so true Jaccard is 17/19 ~ 0.89, 16/20 = 0.80, 15/21 ~ 0.71 — all
    above the 16-band S-curve's 95%-recall knee."""
    from kafka_map_reduce_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidates,
        minhash_signatures,
        word_shingles,
    )

    base = spark.range(600).selectExpr(
        "id AS doc_id",
        """array_join(transform(sequence(0, 19),
           i -> concat('w', CAST(id AS STRING), '_', CAST(i AS STRING))), ' ')
           AS text""",
    )
    planted = []
    for level, c in ((0, 1), (1, 2), (2, 3)):
        planted.append(
            base.filter(f"doc_id % 30 = {level * 10}").selectExpr(
                "doc_id + 100000 AS doc_id",
                f"""array_join(transform(split(text, ' '),
                    (w, i) -> CASE WHEN i < {c}
                              THEN concat('sub_', CAST(i AS STRING), '_',
                                          CAST(doc_id AS STRING))
                              ELSE w END), ' ') AS text""",
            )
        )
    docs = base
    for p in planted:
        docs = docs.unionByName(p)
    expected = {
        (i, i + 100000)
        for level in range(3)
        for i in range(level * 10, 600, 30)
    }
    assert len(expected) == 60

    sh = word_shingles(docs, "text", "doc_id", k=3)
    cands = lsh_candidates(minhash_signatures(sh, num_perm=64), num_perm=64, bands=16)
    found = {
        (r.id_a, r.id_b)
        for r in jaccard_verify(cands, sh, min_jaccard=0.5).collect()
    }
    hits = expected & found
    recall = len(hits) / len(expected)
    assert recall >= 0.95, f"LSH planted-pair recall {recall:.2%} < 95%"
    # and nothing spurious: organic docs share no shingles at all
    assert all(b - a == 100000 for a, b in found), "false-positive pair"


def _overlapping_vectors(spark, n_per_cluster=60, n_clusters=4, dim=8):
    """Deterministic OVERLAPPING cluster mixture: centers only 4 apart on
    one axis with hash-derived noise of comparable magnitude (+-2 per
    coordinate), so nearest-centroid buckets genuinely mix points — the
    hard case for IVF, unlike the separated-cluster fixture."""
    return spark.range(n_per_cluster * n_clusters).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(0, {dim - 1}), d ->
            CAST(CASE WHEN d = CAST(id % {n_clusters} AS INT) THEN 4.0 ELSE 0.0 END
                 + (pmod(xxhash64(id, d), 4001) - 2000) / 1000.0
            AS DOUBLE)) AS embedding""",
    )


def test_ivf_kmeans_recall_floor_on_overlapping_clusters(spark):
    """recall@10 vs exact brute force >= 0.70 with nprobe=2 of 4 buckets
    on overlapping data. The separated-cluster test proves exactness when
    buckets are clean; this pins the graceful-degradation floor when they
    are not (the realistic embedding-corpus regime)."""
    from kafka_map_reduce_spark.operators.similarity import (
        brute_force_topk,
        ivf_kmeans_topk,
    )

    data = _overlapping_vectors(spark)
    probes = data.filter("vec_id < 12")
    corpus = data.filter("vec_id >= 12")
    k = 10
    exact = brute_force_topk(probes, corpus, k=k).collect()
    approx = ivf_kmeans_topk(
        probes, corpus, k=k, n_clusters=4, iters=4, nprobe=2
    ).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[p] & approx_sets.get(p, set())) / len(exact_sets[p])
        for p in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.70, f"IVF mean recall@10 {mean_recall:.2f} < 0.70"


def test_approx_count_distinct_relative_error_bound(spark):
    """HLL++ estimate within 3*rsd of truth — once on a synthetic
    100k-distinct column and once on the exact query configuration
    q_agg_approx_distinct uses (rsd=0.01, lineitem.l_partkey per
    returnflag) against the exact COUNT(DISTINCT)."""
    rsd = 0.01
    est = (
        spark.range(100000)
        .agg(F.approx_count_distinct("id", rsd).alias("a"))
        .collect()[0]["a"]
    )
    assert abs(est - 100000) / 100000 <= 3 * rsd

    from kafka_map_reduce_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    joined = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        rel = abs(r.approx - r.exact) / r.exact
        assert rel <= 3 * rsd, f"{r.l_returnflag}: rel err {rel:.4f} > {3 * rsd}"


def test_percentile_approx_rank_error_bound(spark):
    """GK-sketch guarantee at the q_sketch_quantile configuration
    (accuracy=1000): the returned value's RANK is within n/accuracy of
    the target rank — checked per group against the exact sorted order
    at the 0.5 and 0.9 quantiles the query uses."""
    from kafka_map_reduce_spark.sources import load_table

    accuracy = 1000
    li = load_table(spark, SF_SMOKE, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", F.lit(0.5), F.lit(accuracy)).alias(
                "p50"
            ),
            F.percentile_approx("l_quantity", F.lit(0.9), F.lit(accuracy)).alias(
                "p90"
            ),
            F.sort_array(F.collect_list("l_quantity")).alias("vals"),
        )
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        vals = r.vals
        n = len(vals)
        tol = max(1.0, n / accuracy)
        for q, got in ((0.5, r.p50), (0.9, r.p90)):
            # rank range the returned value occupies in the exact order
            lo_rank = sum(1 for v in vals if v < got)
            hi_rank = sum(1 for v in vals if v <= got)
            target = q * n
            err = min(abs(target - lo_rank), abs(target - hi_rank))
            if not (lo_rank <= target <= hi_rank):
                assert err <= tol, (
                    f"{r.l_returnflag} q={q}: rank err {err:.1f} > {tol:.1f} (n={n})"
                )


def test_simhash_block_candidates_are_complete_vs_brute_force(spark):
    """Unlike MinHash-LSH (probabilistic recall), the 4x16-bit block
    scheme is COMPLETE for Hamming distance <= 3 by pigeonhole — so
    hamming_pairs must find exactly the pairs a brute-force popcount over
    all signature pairs finds, on a corpus crafted to include near-misses
    at every radius 0..5."""
    from kafka_map_reduce_spark.operators.dedup import hamming_pairs

    # signatures engineered around a base pattern: flip b low bits for
    # radius-b planted pairs, plus hash-scattered organic values
    base = 0x0123456789ABCDEF
    rows = [(0, base)]
    for b in range(1, 6):  # ids 1..5 at exact distance b from id 0
        rows.append((b, base ^ ((1 << b) - 1)))
    rows += [(100 + i, (base * (i + 7)) & ((1 << 64) - 1)) for i in range(50)]
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("simhash", T.LongType())]
    )
    sim = spark.createDataFrame(
        [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in rows], schema
    )
    got = {
        (r.id_a, r.id_b): r.dist for r in hamming_pairs(sim, max_dist=3).collect()
    }

    vals = {i: v & ((1 << 64) - 1) for i, v in rows}
    want = {
        (a, b): bin(vals[a] ^ vals[b]).count("1")
        for a in vals
        for b in vals
        if a < b and bin(vals[a] ^ vals[b]).count("1") <= 3
    }
    assert got == want
    assert {(0, 1), (0, 2), (0, 3)} <= set(got)  # radii 1..3 present
    assert (0, 4) not in got and (0, 5) not in got  # out of radius


def test_ivf_kmeans_train_sample_noop_when_corpus_small(spark):
    """ivf_kmeans_topk's train_sample_n >= ~corpus size must be a
    numeric NO-OP (mod floors to 1): pins the registered
    q_sim_ivf_kmeans contract — at every correctness-gated SF the
    corpus is <= 2k vectors, so adopting train_sample_n=2048 there
    (r10, closing the r9 verdict's finding #2) changed nothing."""
    from kafka_map_reduce_spark.operators.similarity import ivf_kmeans_topk

    data = _overlapping_vectors(spark)
    probes = data.filter("vec_id < 12")
    corpus = data.filter("vec_id >= 12")
    d0 = ivf_kmeans_topk(
        probes, corpus, k=10, n_clusters=4, iters=4, nprobe=2
    ).collect()
    d1 = ivf_kmeans_topk(
        probes, corpus, k=10, n_clusters=4, iters=4, nprobe=2,
        train_sample_n=10_000,
    ).collect()
    assert sorted(
        (r.probe_id, r.rank, r.neighbor_id, r.sim) for r in d1
    ) == sorted((r.probe_id, r.rank, r.neighbor_id, r.sim) for r in d0)


def test_ivf_kmeans_sampled_training_recall_floor(spark):
    """A coarse quantizer trained on a ~1-in-3 hash-sample
    (train_sample_n=60 over the 228-vector corpus -> mod 3) must still
    clear the same 0.70 recall floor as full training on the
    OVERLAPPING-cluster fixture (measures 1.00 here — with 4 coarse
    cells, ~76 samples pin the cell structure as well as 228 do; the
    floor exists so a regression in the sampled path fails loudly)."""
    from kafka_map_reduce_spark.operators.similarity import (
        brute_force_topk,
        ivf_kmeans_topk,
    )

    data = _overlapping_vectors(spark)
    probes = data.filter("vec_id < 12")
    corpus = data.filter("vec_id >= 12")

    n_corpus = corpus.count()
    n_train = corpus.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(n_corpus // 60)) == 0
    ).count()
    assert n_train < n_corpus / 2, (
        f"fixture too small to exercise sampling: {n_train}/{n_corpus}"
    )

    k = 10
    exact = brute_force_topk(probes, corpus, k=k).collect()
    approx = ivf_kmeans_topk(
        probes, corpus, k=k, n_clusters=4, iters=4, nprobe=2,
        train_sample_n=60,
    ).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    mean_recall = sum(
        len(exact_sets[p] & approx_sets.get(p, set())) / len(exact_sets[p])
        for p in exact_sets
    ) / len(exact_sets)
    assert mean_recall >= 0.70, (
        f"sampled-training IVF recall {mean_recall:.2f} < 0.70"
    )
