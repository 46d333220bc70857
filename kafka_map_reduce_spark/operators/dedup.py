"""Deduplication operators (Tier C, SURVEY §2.2) — exact, MinHash-LSH,
SimHash, n-gram Jaccard.

Designed for the 100 TB training-data pipeline case:

- exact dedup: one hash shuffle on a 16-byte digest, keep-min-id — the
  cheapest possible global dedup.
- MinHash+LSH: signatures are computed in ONE pass over exploded shingles
  (64 mins in a single hash aggregate), banded so candidate generation is
  an equi-join on (band, band_hash) buckets — never an all-pairs product.
  Candidate verification joins shingle sets only for candidate pairs.
  (ClusterJoin VLDB'14 / standard LSH banding; PAPERS.md corpus.)
- SimHash: 64-bit signature per doc from token hashes, bit-majority.

All hashing uses xxhash64 (JVM, whole-stage codegen) — no Python on the
100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized(text_col) -> F.Column:
    return F.lower(F.trim(text_col))


# fan_out_scan (the gated small-scan repartition the MinHash queries
# adopt) lives in sources/tables.py next to load_table — it is
# scan-level infrastructure, not a dedup operator (r11 review).


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by content digest, keep the smallest id as canonical."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
        .select("keep_id", "dup_cnt")
    )


def content_digests(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, digest) of normalized content — the persistable exact-dedup
    index format (append per ingest batch, like the LSH band index)."""
    return df.select(
        F.col(id_col).alias("id"), F.md5(normalized(F.col(text_col))).alias("digest")
    )


def exact_dedup_against(
    new_docs: DataFrame, digest_index: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Incremental exact dedup: split a new batch into (novel, dups)
    against a persisted ``content_digests`` index — one digest equi-join,
    cost tracks the batch. Within-batch exact dups collapse to the min id
    first (so a batch with internal copies contributes one candidate).
    Returns (novel_digests to append to the index, dup_pairs
    (id, matches_id)). The capped-out template clusters of the LSH/SimHash
    paths route here: identical text is exactly what this catches."""
    batch = content_digests(new_docs, text_col, id_col)
    batch_canon = batch.groupBy("digest").agg(F.min("id").alias("id"))
    idx = digest_index.select(
        F.col("digest"), F.col("id").alias("matches_id")
    )
    joined = batch_canon.join(idx, "digest", "left")
    novel = joined.filter(F.col("matches_id").isNull()).select("id", "digest")
    # dups: batch ids whose digest exists in the index, plus batch ids
    # collapsed onto an earlier batch id
    cross_dups = joined.filter(F.col("matches_id").isNotNull()).select(
        "id", "matches_id"
    )
    within_dups = (
        batch.join(
            batch_canon.withColumnRenamed("id", "matches_id"), "digest"
        )
        .filter(F.col("id") != F.col("matches_id"))
        .select("id", "matches_id")
    )
    return novel, cross_dups.unionByName(within_dups)


def _shingle_array(text_col: str, k: int) -> F.Column:
    """Distinct k-word shingles of a document as an in-row array."""
    shingles = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < {k} THEN array() "
        f"ELSE transform(sequence(1, size(split({text_col}, ' ')) - {k - 1}), "
        f"i -> array_join(slice(split({text_col}, ' '), i, {k}), ' ')) END"
    )
    return F.array_distinct(shingles)


def word_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct k-word shingles per document.

    Distinctness comes from ``array_distinct`` BEFORE the explode — a
    narrow per-row operation. A ``.distinct()`` after the explode would
    be semantically redundant (rows are already unique per (id, s)) yet
    cost a full shuffle of the exploded shingle table, and Catalyst
    recomputes this subtree in every join branch that consumes it, so
    the waste would be paid ~3x per LSH plan (signatures + both
    verification sides). Callers must pass unique ``id_col`` values
    (true for every registered corpus)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingle_array(text_col, k)).alias("s"),
    )


def minhash_signatures(shingled: DataFrame, num_perm: int = 64) -> DataFrame:
    """One pass: num_perm min-hashes per id from exploded shingles.

    Each 'permutation' is xxhash64(shingle, seed=i); the signature matrix
    is a single hash aggregate — no per-permutation shuffle. The shingle
    count ``n`` rides the SAME aggregate for free: downstream exact
    verification needs per-id set sizes, and carrying them here spares
    jaccard_verify a separate groupBy over the (recomputed) shingle table
    for each side of the pair.

    Measured alternative (round 5): a shuffle-FREE in-row formulation —
    ``array_min(transform(shingle_array, s -> xxhash64(s, i)))`` per
    permutation, no explode, no groupBy — produced bit-identical
    signatures but ran 1.7-1.8x SLOWER end-to-end on the capped LSH
    query (sf1: 16.1 s vs 5.6 s; sf10/500k docs: 56.8 s vs 33.3 s,
    min-of-2 interleaved, same session). Higher-order functions are
    evaluated interpreted (outside whole-stage codegen) and each of the
    64 ``transform`` calls allocates a fresh array per document, which
    costs more than the (id, shingle) exchange it avoids — Tungsten's
    shuffle of narrow rows is cheaper than non-codegen expression
    evaluation. The aggregate stays; revisit only if Spark gains codegen
    for HOFs.

    SQL-string face of the min-hash aggregates (r17, the SimHash
    treatment from r13): the Column-object loop
    (``F.min(F.xxhash64(F.col("s"), F.lit(i)))`` x num_perm) cost
    ~0.35 s of DRIVER time per plan build in ~300 py4j round trips;
    one parsed expr per aggregate builds the identical tree JVM-side
    (0.53 -> 0.14 s construction measured; outputs and schema
    bit-identical — the SQL integer literal is IntegerType exactly like
    F.lit(i)). Fixed cost in data volume — irrelevant at 100 TB,
    ~0.5 s/plan at bench SF across the two LSH headline queries."""
    aggs = [F.expr(f"min(xxhash64(s, {i})) AS mh{i}") for i in range(num_perm)]
    return shingled.groupBy("id").agg(*aggs, F.expr("count(1) AS n"))


def _drop_hot_buckets(
    df: DataFrame, keys: list[str], max_bucket_size: int
) -> DataFrame:
    """Shared skew guard: drop rows whose ``keys`` bucket holds more than
    ``max_bucket_size`` members. A bucket of N near-identical documents
    emits ~N^2/2 candidate pairs from one join key — the quadratic
    pathology of every equi-join candidate scheme (LSH bands, SimHash
    blocks, index probes). Capped members are template clusters that
    belong to exact dedup, which finds identical text in one linear
    shuffle."""
    # Anti-join against the HOT buckets, not inner-join against the small
    # ones (r12): the two forms are exactly equivalent (every bucket is
    # on one side of the threshold), but at corpus scale most buckets are
    # singletons, so the "small" list is nearly the full bucket table —
    # inner-joining it re-shuffles O(rows) a second time — while the hot
    # list is bounded by total_rows/max_bucket_size and in practice tiny
    # (the template clusters), so AQE broadcasts it and the cap costs one
    # map-side anti probe instead of a corpus-sized shuffle. CAVEAT: the
    # equivalence requires non-null keys (an inner join drops a null-key
    # row, an anti join keeps it); every caller's keys are hash/block
    # values that cannot be null.
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > max_bucket_size)
        .drop("__bn")
    )
    return df.join(hot, keys, "left_anti")


def lsh_banded(
    signatures: DataFrame, num_perm: int = 64, bands: int = 16
) -> DataFrame:
    """Band a minhash signature matrix into (id, [n], band, bh) rows — one
    row per (document, band), bh = hash of the band's signature slice.

    This IS the persistable LSH index format for incremental corpus
    building: append each ingest batch's banded rows to a parquet table
    and probe new batches against it with ``lsh_candidates_against`` —
    no re-banding of the historical corpus, index growth = write rate.

    The explode(array(struct(band, bh)...)) tree is built as ONE parsed
    expr (r17, same rationale as minhash_signatures): the Column-object
    loop cost ~0.27 s of driver time per plan build; the SQL face is
    bit-identical (integer literals are IntegerType on both paths,
    verified on the sf0.1 corpus)."""
    rows_per_band = num_perm // bands
    parts = ", ".join(
        "struct({b} AS band, xxhash64({b}, {mhs}) AS bh)".format(
            b=b,
            mhs=", ".join(
                f"mh{b * rows_per_band + j}" for j in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    carry_n = "n" in signatures.columns
    n_cols = [F.col("n")] if carry_n else []
    return signatures.select(
        "id",
        *n_cols,
        F.expr(f"explode(array({parts}))").alias("e"),
    ).select(
        "id", *n_cols, F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )


def lsh_candidates(
    signatures: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature, bucket-join: candidate pairs (id_a < id_b).

    ``max_bucket_size`` is the hot-band guard for the 100 TB case: a band
    bucket holding N near-identical documents (boilerplate/template
    clusters) would emit N^2/2 candidate pairs from a single join key —
    the LSH skew pathology. When set, buckets with more than
    ``max_bucket_size`` members are dropped from candidate generation
    (their members are template clusters better handled by exact dedup).
    Default None keeps every bucket — required for oracle parity.
    """
    carry_n = "n" in signatures.columns
    n_cols = [F.col("n")] if carry_n else []
    # Consume-once barrier: the banded frame fans out into up to FOUR plan
    # branches below (hot-bucket counts, the cap join, and both sides of
    # the pair join), and Catalyst does not share subtrees across join
    # branches — without materialization the shingle+minhash aggregation
    # (the expensive, corpus-wide part of the plan) re-executes once per
    # branch (measured: 4 parquet scans / 4 signature aggregates in the
    # executed sf0.1 plan). The barrier is O(bands*N) rows of ~32 B —
    # proportional to the corpus's document COUNT, never its text — and
    # spills to disk; recomputing the tokenize+hash of the raw text 3
    # extra times is the cost it replaces. Blocks are ContextCleaner-
    # reclaimed on GC (same lifecycle note as jaccard_verify).
    banded = lsh_banded(signatures, num_perm, bands).localCheckpoint(eager=False)
    if max_bucket_size is not None:
        banded = _drop_hot_buckets(banded, ["band", "bh"], max_bucket_size)
    other_cols = [F.col("id").alias("id_b")] + (
        [F.col("n").alias("nb")] if carry_n else []
    ) + [F.col("band").alias("band_b"), F.col("bh").alias("bh_b")]
    other = banded.select(*other_cols)
    out_cols = [F.col("id").alias("id_a"), F.col("id_b")] + (
        [F.col("n").alias("na"), F.col("nb")] if carry_n else []
    )
    return (
        banded.join(
            other,
            (F.col("band") == F.col("band_b"))
            & (F.col("bh") == F.col("bh_b"))
            & (F.col("id") < F.col("id_b")),
        )
        .select(*out_cols)
        .distinct()
    )


# Auto-prune heuristic constants (jaccard_verify(prune_to_candidates=None)):
# prune only when the candidate-id upper bound is under this fraction of the
# estimated corpus size AND the corpus is big enough that the two extra
# semi-join stages amortize. Measured: ~25% SLOWER at the 500-doc test
# tables (fixed per-stage overhead dominates), ~10% FASTER at the 50k-doc
# sf1 bench replicas, widening with corpus size — the floor sits between.
AUTO_PRUNE_MAX_RATIO = 0.5
AUTO_PRUNE_MIN_CORPUS = 32768


def lsh_candidates_against(
    banded_new: DataFrame,
    banded_index: DataFrame,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs between a NEW batch and a historical LSH index —
    the incremental-ingest form of ``lsh_candidates``. Both inputs are
    ``lsh_banded`` outputs (the index typically read back from its
    parquet table); the join is (band, bh) equi only, so cost scales with
    the new batch and bucket overlap, never the corpus. Returns
    (id_a = new id, id_b = index id[, na, nb]) distinct pairs; ids must
    not collide across the two sides (disjoint id spaces — enforced).

    ``max_bucket_size`` caps the INDEX side per (band, bh): a template
    bucket accumulated over months of ingest would otherwise emit
    O(bucket) candidates for every new member forever. Capped buckets
    belong to exact dedup, same contract as ``lsh_candidates``. NOTE the
    cost model: the cap RECOUNTS index bucket sizes with a full-index
    group-by on every call — O(index) per batch, which re-introduces the
    corpus term this probe exists to avoid. At standing-index scale,
    either pre-cap buckets when APPENDING to the index table (drop or
    flag over-full buckets at write time, so probes need no counting) or
    maintain a (band, bh, count) sidecar the way the line-hash index
    keeps its counts (append_line_counts/compact_line_index). No caller
    in this repo passes the cap here yet; the queries exercise the cap
    on the batch-local generators.
    """
    carry_n = {"n"} <= set(banded_new.columns) and {"n"} <= set(
        banded_index.columns
    )
    idx = banded_index
    if max_bucket_size is not None:
        idx = _drop_hot_buckets(idx, ["band", "bh"], max_bucket_size)
    new_cols = [F.col("id").alias("id_a")] + (
        [F.col("n").alias("na")] if carry_n else []
    ) + ["band", "bh"]
    idx_cols = [F.col("id").alias("id_b")] + (
        [F.col("n").alias("nb")] if carry_n else []
    ) + [F.col("band").alias("band_b"), F.col("bh").alias("bh_b")]
    # Disjoint id spaces are the caller's contract; a collision would
    # silently alias two different documents. This guard is BEST-EFFORT:
    # it rides inside the plan (raise_error on the projected key, zero
    # extra jobs) and fires only when a colliding id meets itself in a
    # bucket — full enforcement needs an id anti-join, which
    # incremental_near_dedup performs (check_disjoint=True) because its
    # novel/dup split would silently misroute on an undetected overlap.
    guarded_id_a = (
        F.when(
            F.col("id_a") != F.col("id_b"), F.col("id_a")
        ).otherwise(
            F.raise_error(
                "lsh_candidates_against: new-batch and index id spaces "
                "overlap (id present on both sides); assign disjoint ids"
            )
        ).alias("id_a")
    )
    out_cols = [guarded_id_a, F.col("id_b")] + (
        [F.col("na"), F.col("nb")] if carry_n else []
    )
    return (
        banded_new.select(*new_cols)
        .join(
            idx.select(*idx_cols),
            (F.col("band") == F.col("band_b")) & (F.col("bh") == F.col("bh_b")),
        )
        .select(*out_cols)
        .distinct()
    )


def incremental_near_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    banded_index: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.5,
    max_bucket_size: int | None = None,
    cache_registry: list | None = None,
    check_disjoint: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingest step of incremental corpus building: detect which docs
    of ``new_docs`` are near-dups of the already-indexed corpus or of
    each other, and emit the banded rows to append to the index.

    The division of labor at 100 TB: the persisted ``banded_index``
    (``lsh_banded`` rows appended batch by batch) makes CANDIDATE
    generation an equi-join that scales with the new batch, never the
    corpus; exact Jaccard VERIFICATION re-shingles only the candidate
    index docs — a semi-join pushdown into ``corpus_docs``, a vanishing
    fraction of the corpus per batch.

    Returns ``(dup_pairs, novel_ids, banded_new)``:
    - ``dup_pairs`` — verified (id_a = new id, id_b = indexed-or-newer
      partner, jaccard >= min_jaccard);
    - ``novel_ids`` — one-column (id) frame: new docs with no partner —
      the docs to keep;
    - ``banded_new`` — ``lsh_banded`` rows for ALL new docs; append the
      novel subset (semi-join on novel_ids) to the index table so index
      growth tracks the KEPT ingest rate.

    Id spaces of new batch and corpus must be DISJOINT — the novel/dup
    split discriminates pair sides by id membership, so an overlap would
    silently drop the wrong document. ``check_disjoint=True`` (default)
    enforces it with one anti-join against the corpus id column (a
    single-column scan; cheap next to the batch's own joins — disable
    only if ids are disjoint by construction, e.g. monotonic ingest
    counters). ``lsh_candidates_against``'s in-plan guard alone is
    best-effort.

    ``cache_registry``: pass a list to collect the batch-sized DataFrames
    this call ``persist()``s; after running your actions on the outputs,
    ``unpersist()`` each — in a long-running stream (thousands of ingest
    steps in one session) skipping this leaks executor cache until LRU
    eviction starts thrashing genuinely hot data. One lifecycle the
    registry does NOT cover: ``lsh_candidates`` internally
    ``localCheckpoint(eager=False)``s its banded frame (the consume-once
    barrier), and a checkpointed RDD cannot be handed back as an
    unpersistable DataFrame — those blocks are reclaimed by the driver's
    ContextCleaner when the plan that references them is garbage-
    collected, not at ``unpersist()`` time. Per ingest step that is one
    O(bands x batch)-row block set (batch-sized, NOT corpus-sized, since
    only the new batch's frames are checkpointed here); a thousands-of-
    batches session should therefore not hold references to returned
    frames after acting on them, so driver GC can release the lineage
    promptly.
    """
    # The batch is the SMALL side by design; its shingles and signatures
    # feed four plan branches (within-batch candidates, the index probe,
    # and both verification sides), so persist them — without this every
    # branch re-explodes and re-hashes the batch, and one ingest step
    # costs more than the full self-dedup it is meant to avoid (measured
    # 14.3s -> see bench incremental_ingest for the fixed number).
    if check_disjoint:
        overlap = (
            new_docs.select(F.col(id_col).alias("id"))
            .join(corpus_docs.select(F.col(id_col).alias("id")), "id")
            .limit(1)
            .count()
        )
        if overlap:
            raise ValueError(
                "incremental_near_dedup: new-batch and corpus id spaces "
                "overlap; the novel/dup split would misroute documents — "
                "assign disjoint ids"
            )
    shingled_new = word_shingles(new_docs, text_col, id_col, k).persist()
    sigs_new = minhash_signatures(shingled_new, num_perm).persist()
    if cache_registry is not None:
        cache_registry.extend([shingled_new, sigs_new])
    banded_new = lsh_banded(sigs_new, num_perm, bands)

    within = lsh_candidates(
        sigs_new, num_perm, bands, max_bucket_size=max_bucket_size
    )
    cross = lsh_candidates_against(
        banded_new, banded_index, max_bucket_size=max_bucket_size
    )
    cands = within.unionByName(cross, allowMissingColumns=True)

    # verification shingle source: the whole new batch + only the index
    # docs that appear as candidates (left-semi pushdown into the corpus)
    cand_index_docs = corpus_docs.join(
        cross.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    shingled_all = shingled_new.unionByName(
        word_shingles(cand_index_docs, text_col, id_col, k)
    )
    # na/nb carry only when BOTH inputs had them; after the union with
    # allowMissingColumns a missing side yields nulls — drop the columns
    # unless both carried, so jaccard_verify recomputes sizes correctly.
    if not ({"na", "nb"} <= set(within.columns) and {"na", "nb"} <= set(cross.columns)):
        cands = cands.select("id_a", "id_b")
    pairs = jaccard_verify(cands, shingled_all, min_jaccard)

    # the duplicate side of a pair: within-batch pairs keep the min id
    # (dup = id_b, which is always the larger new id); cross pairs drop
    # the new doc (dup = id_a — the corpus copy wins). Disjoint id spaces
    # make membership of id_b in the new batch the exact discriminator.
    # pairs and novel_ids are bounded-small (candidate-bounded / batch-
    # bounded) and every caller runs several actions over them (write
    # pairs, append index via novel semi-join, append corpus) — persist
    # so the expensive verification join runs once, not once per action
    pairs = pairs.persist()
    new_ids = new_docs.select(F.col(id_col).alias("id")).distinct()
    within_dups = pairs.join(
        new_ids.withColumnRenamed("id", "id_b"), "id_b", "left_semi"
    ).select(F.col("id_b").alias("id"))
    cross_dups = pairs.join(
        new_ids.withColumnRenamed("id", "id_b"), "id_b", "left_anti"
    ).select(F.col("id_a").alias("id"))
    novel_ids = new_ids.join(
        within_dups.union(cross_dups).distinct(), "id", "left_anti"
    ).persist()
    if cache_registry is not None:
        cache_registry.extend([pairs, novel_ids])
    return pairs, novel_ids, banded_new


def jaccard_verify(
    candidates: DataFrame,
    shingled: DataFrame,
    min_jaccard: float,
    prune_to_candidates: bool | None = False,
    corpus_count: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate pairs only (never all pairs).

    ``prune_to_candidates`` semi-joins the shingle table down to candidate
    ids before the intersection join. At corpus scale — candidates are a
    vanishing fraction of documents — this keeps the (id, shingle) shuffle
    proportional to candidates, not the corpus; at small scale the two
    extra semi-join stages cost more than they save (measured ~25% slower
    at the 500-doc test tables), hence default off.

    ``prune_to_candidates=None`` decides adaptively, cheapest check first:
    the corpus size comes from ``corpus_count`` when the caller has it (a
    parquet-metadata ``docs.count()`` — effectively free; the registered
    queries pass it) and otherwise from one ``approx_count_distinct``
    pass over the shingle table. Below ``AUTO_PRUNE_MIN_CORPUS`` docs the
    decision is already OFF and NO other work happens — the small-corpus
    path pays only the corpus lookup. Only at/above the floor are the
    candidates persisted and counted (candidates are bounded by design —
    LSH band buckets, optionally capped — so this is the small side, and
    the persist lets the verification join reuse the materialization);
    pruning then turns on when ``2 * |pairs|`` (an upper bound on distinct
    candidate ids) is under ``AUTO_PRUNE_MAX_RATIO`` of the corpus. Both
    forced paths and auto return identical answers (unit-tested); the
    knob only moves shuffle volume. Cache lifecycle: with a
    ``cache_registry`` the persisted candidates are handed to the caller
    (unpersist after your actions); without one the candidates are
    localCheckpoint'ed instead — same materialization reuse across the
    decision count and the verification join, but the blocks are
    ContextCleaner-reclaimed on garbage collection, so registry-less
    invocations (driver/bench runs) cannot accumulate pinned cache.

    If ``candidates`` already carries per-id set sizes as ``na``/``nb``
    (lsh_candidates forwards them from the minhash aggregate), the two
    size-lookup joins — each of which would recompute the shingle groupBy,
    since Catalyst does not share subtrees across join branches — are
    skipped entirely.
    """
    if prune_to_candidates is None:
        corpus_est = (
            corpus_count
            if corpus_count is not None
            else shingled.agg(F.approx_count_distinct("id").alias("n")).collect()[
                0
            ]["n"]
        )
        if corpus_est < AUTO_PRUNE_MIN_CORPUS:
            prune_to_candidates = False
        else:
            if cache_registry is not None:
                # caller-managed lifecycle: persist, hand over, caller
                # unpersists after its actions
                candidates = candidates.persist()
                cache_registry.append(candidates)
            else:
                # No caller-managed lifecycle: localCheckpoint instead of
                # persist. The materialization is still shared between
                # the decision count and the verification join (an
                # unpersist-after-count would recompute the candidate
                # join at corpus scale — measured 3.7x on the sf1 capped
                # query), but checkpoint blocks are reclaimed by the
                # ContextCleaner when the DataFrame is garbage-collected,
                # unlike CacheManager entries which pin executor memory
                # until an explicit unpersist — the leak-per-invocation
                # the advisor flagged in long-lived driver/bench sessions.
                candidates = candidates.localCheckpoint(eager=True)
            n_pairs = candidates.count()
            prune_to_candidates = 2 * n_pairs <= AUTO_PRUNE_MAX_RATIO * corpus_est
    carried = {"na", "nb"} <= set(candidates.columns)
    sizes = (
        None
        if carried
        else shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    )
    if prune_to_candidates:
        # Candidate-bounded barrier (r18, r17 verdict item #4): the
        # pruned shingle table feeds BOTH sides of the intersection
        # join, and Catalyst shares no subtrees across join branches —
        # without a barrier each side re-runs the semi-joined
        # tokenize+explode pipeline. The localCheckpoint is bounded by
        # the candidate id set by construction (the same bound that
        # justified pruning in the first place), so unlike a full
        # shingle-table barrier it stays candidate-sized at any scale:
        # one pruned evaluation, materialized once, read twice.
        shingled = shingled.join(
            candidates.select(F.col("id_a").alias("id"))
            .union(candidates.select(F.col("id_b").alias("id")))
            .distinct(),
            "id",
            "left_semi",
        ).localCheckpoint(eager=False)
    a = shingled.select(F.col("id").alias("id_a"), "s")
    b = shingled.select(F.col("id").alias("id_b2"), F.col("s").alias("s_b"))
    pair_keys = ["id_a", "id_b"] + (["na", "nb"] if carried else [])
    inter = (
        candidates.join(a, "id_a")
        .join(b, (F.col("id_b") == F.col("id_b2")) & (F.col("s") == F.col("s_b")))
        .groupBy(*pair_keys)
        .agg(F.count(F.lit(1)).alias("i"))
    )
    if not carried:
        inter = inter.join(
            sizes.withColumnsRenamed({"id": "id_a", "n": "na"}), "id_a"
        ).join(sizes.withColumnsRenamed({"id": "id_b", "n": "nb"}), "id_b")
    return (
        inter.withColumn(
            "jaccard",
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "id_a",
            "id_b",
            (F.floor(F.col("jaccard") * 10000 + F.lit(0.5)) / F.lit(10000)).alias(
                "jaccard"
            ),
        )
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, bit-majority vote.

    Expressed as explode -> packed-lane counting sums -> majority -> bit
    pack; all JVM built-ins, single aggregation pass. Lane ``j`` packs
    TWO bit counters into one 64-bit sum — bit ``j``'s ones-count in the
    low 32 bits and bit ``j+32``'s in the high 32 — so the aggregation
    carries 33 buffers per document (32 lanes + the token count) instead
    of the naive 64 per-bit sums. That halves the partial-aggregate
    shuffle width (264 B vs 520 B per doc) AND roughly halves the
    Catalyst/codegen cost of the fresh plan (A/B at sf0.1: 1.4-1.7 s vs
    1.7-2.3 s per cold plan; outputs bit-identical on all 5000 docs).

    Lane packing is carry-safe unconditionally: each 32-bit counter is
    at most the document's token count n, and the lane sum is bounded by
    n*(2^32+1) (low counter + high counter shifted by 32), which stays
    below the signed-64 limit 2^63 exactly while n < 2^31 — so corruption
    would need a single document of >= 2^31 tokens (tens of GB of text).
    Majority semantics are unchanged: the old +-1-sum test ``sum > 0``
    is exactly ``2*ones > n``, ties (possible only for even n) resolve
    to 0 on both forms.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalized(F.col(text_col)), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    hashed = toks.select("id", F.xxhash64("t").alias("h"))
    # SQL-string faces of the lane/pack expressions (r13): the Column-
    # object construction of these trees (32 lane aggregates + a 64-term
    # packed majority sum) cost ~1.1 s of DRIVER time per plan build —
    # hundreds of py4j round trips plus eager re-analysis per
    # transformation — which the r12 watch-item profile had misread as
    # executor signature work (the cores instrument showed 0.3 task-sec
    # under a 2.0 s wall; the r13 fan-out probe's exchange fix
    # (tool retired r17; numbers pinned in SCALE_SPOT_r13)
    # rightly lost because no exchange touches plan-build time). One
    # F.expr parse builds the identical trees JVM-side: build 1.092 ->
    # 0.100 s, full capped query wall 1.997 -> 0.890 s (min-of-3, idle),
    # outputs bit-identical on the sf0.1 corpus. Fixed cost in data
    # volume either way — irrelevant at 100 TB, dominant at bench SF.
    lanes = hashed.groupBy("id").agg(
        F.expr("count(1) AS __n"),
        *[
            F.expr(
                f"sum((shiftrightunsigned(h, {j}) & 1) + "
                f"shiftleft(shiftrightunsigned(h, {j + 32}) & 1, 32)) "
                f"AS lane{j}"
            )
            for j in range(32)
        ],
    )

    def _ones(i: int) -> str:
        if i < 32:
            return f"(lane{i} & 4294967295)"
        return f"shiftrightunsigned(lane{i - 32}, 32)"

    def _bit(i: int) -> str:
        if i < 63:
            return f"CAST({2 ** i} AS BIGINT)"
        # -2^63 has no direct BIGINT literal (its positive half overflows)
        return "(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"

    packed_sql = " + ".join(
        ["CAST(0 AS BIGINT)"]
        + [
            f"IF({_ones(i)} * 2 > __n, {_bit(i)}, CAST(0 AS BIGINT))"
            for i in range(64)
        ]
    )
    return lanes.selectExpr("id", f"({packed_sql}) AS simhash")


def hamming_pairs(
    sim: DataFrame, max_dist: int, max_bucket_size: int | None = None
) -> DataFrame:
    """Pairs with Hamming distance <= max_dist.

    Candidate generation by the 4-block trick: with 64 bits split into 4
    16-bit blocks, any pair at distance <= 3 must agree exactly on at
    least one block (pigeonhole), so an equi-join on block values finds
    every candidate, then an exact popcount verifies — never an all-pairs
    product. The guarantee BREAKS at max_dist >= 4 (4 differing bits can
    land one per block), which would silently drop pairs; rejected here
    rather than returning incomplete results.

    ``max_bucket_size`` is the hot-block skew guard for the 100 TB case —
    the SimHash twin of ``lsh_candidates``'s hot-band cap: a template
    cluster of N near-identical documents shares all four block values
    and would emit ~N^2/2 candidate pairs from a single join key. When
    set, (block, value) buckets holding more than ``max_bucket_size``
    members are dropped from candidate generation; their members are
    template clusters that belong to exact dedup (identical or
    normalization-identical text), which finds them in one linear
    shuffle. Default None keeps every bucket.
    """
    if not 0 <= max_dist <= 3:
        raise ValueError(
            f"hamming_pairs 4-block candidate generation is complete only "
            f"for max_dist in [0, 3]; got {max_dist}. For larger radii use "
            f"more blocks (block count must exceed max_dist)."
        )
    # parsed-expr face (r17, the minhash/lsh_banded treatment): the
    # 4-block shift/mask/struct tree as ONE parse — identical
    # expressions, ~0.13 s less py4j per plan build.
    parts = ", ".join(
        f"struct({b} AS b, shiftrightunsigned(simhash, {16 * b}) & 65535 AS v)"
        for b in range(4)
    )
    exploded = sim.select(
        "id",
        "simhash",
        F.expr(f"explode(array({parts}))").alias("e"),
    ).select("id", "simhash", F.col("e.b").alias("b"), F.col("e.v").alias("v"))
    # Consume-once barrier, same rationale as lsh_candidates: the block
    # frame feeds the hot-bucket count, the cap join, and both pair-join
    # sides, so without it the SimHash aggregation (explode + xxhash over
    # every token of the corpus) re-executes once per branch (measured: 4
    # scans / 4 signature aggregates in the executed sf0.1 plan). 4N rows
    # of ~32 B, disk-spilling, ContextCleaner-reclaimed.
    exploded = exploded.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        exploded = _drop_hot_buckets(exploded, ["b", "v"], max_bucket_size)
    other = exploded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("simhash_b"),
        F.col("b").alias("b_b"), F.col("v").alias("v_b"),
    )
    cand = exploded.join(
        other,
        (F.col("b") == F.col("b_b"))
        & (F.col("v") == F.col("v_b"))
        & (F.col("id") < F.col("id_b")),
    ).select("id", "id_b", "simhash", "simhash_b")
    # Dedup AFTER the popcount filter, not before (r12): a pair matching
    # in k blocks appears k times, and the old pre-verify distinct
    # shuffled the ENTIRE candidate stream (mostly false positives — a
    # 16-bit block agreement says little about the other 48 bits) just
    # to avoid re-running a stateless one-instruction popcount on <= 4
    # duplicate rows. Post-filter, only TRUE pairs reach the distinct —
    # the shuffle shrinks from O(candidates) to O(result). Contrast
    # lsh_candidates, where dedup stays BEFORE verification because its
    # verify is an expensive per-candidate intersection join.
    return (
        cand.withColumn(
            "dist", F.bit_count(F.col("simhash").bitwiseXOR(F.col("simhash_b")))
        )
        .filter(F.col("dist") <= max_dist)
        .select(F.col("id").alias("id_a"), "id_b", "dist")
        .distinct()
    )


# Driver-local union-find gate for the connected-components variants
# (r17, guide §1.2 "the distributed algorithm" — the same treatment as
# kmeans_fit's _lloyd_local twin): the registered cluster fixtures are
# _bounded_subset graphs (<= 1000 nodes), yet the label-propagation /
# star loops ran O(rounds) join+checkpoint+count SPARK JOBS on KB-sized
# state — measured 2.2-3.5 s of driver plan-build per query for < 6
# task-seconds of work. Inputs at or under this gate (probed with a
# LIMIT-bounded collect, so an over-gate graph costs one truncated probe
# and falls through to the distributed loop) are solved with a local
# min-root union-find — the same (id, min reachable id) fixpoint both
# loops converge to. Callers that exist to WITNESS the distributed loop
# (the sf1 star-convergence battery, the non-convergence contract test)
# pass local_max_edges=0 to force it.
_CC_LOCAL_MAX = 100_000


def _uf_min_labels(edge_rows, node_filter=None):
    """Union-find with the component-minimum as representative.

    ``edge_rows``: iterable of (a, b); ``node_filter``: optional set —
    edges with an endpoint outside it are DROPPED, replicating the
    label-propagation semantics where only ids present in ``nodes``
    relay labels. Returns {node: min_reachable_id} for every node that
    appears in a kept edge."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        if a == b:
            continue
        if node_filter is not None and (
            a not in node_filter or b not in node_filter
        ):
            continue
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return {n: find(n) for n in parent}


def _probe_local(df: DataFrame, limit: int):
    """LIMIT-bounded collect: the row list if the frame holds at most
    ``limit`` rows, else None (having read only limit+1 rows)."""
    if limit <= 0:
        return None
    rows = df.limit(limit + 1).collect()
    return rows if len(rows) <= limit else None


_CC_LOCAL_TYPES = ("int", "bigint", "smallint")


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iter: int = 20,
    stats: dict | None = None,
    local_max_edges: int = _CC_LOCAL_MAX,
) -> DataFrame:
    """Cluster duplicate-pair output into components: every node gets the
    minimum reachable id as ``cluster_id`` (the canonical document).

    Min-label propagation: each round, every node takes the min of its own
    label and its neighbors' labels — one keyed shuffle per round,
    converging in O(component diameter) rounds (near-dup clusters are
    shallow, so a handful). ``localCheckpoint`` truncates the iterative
    lineage so the plan doesn't grow per round. At extreme scale the
    large-star/small-star variant halves round count; the per-round join
    shape (edges x labels on dst) is the same.

    ``pairs``: columns (id_a, id_b); ``nodes``: one id column (singletons
    become their own cluster); returns (id, cluster_id).

    ``stats`` (optional dict) records ``rounds`` = label-propagation
    rounds to convergence — the measured witness of the O(diameter)
    claim (same convention as ``connected_components_star``); 0 means
    the graph was solved by the driver-local union-find twin (see
    ``_CC_LOCAL_MAX``), which ``local_max_edges=0`` disables.
    """
    id_col = nodes.columns[0]
    if (
        local_max_edges > 0
        and pairs.schema["id_a"].dataType.simpleString() in _CC_LOCAL_TYPES
        and pairs.schema["id_b"].dataType.simpleString() in _CC_LOCAL_TYPES
        and nodes.schema[0].dataType.simpleString() in _CC_LOCAL_TYPES
    ):
        # Barrier the pair stream BEFORE probing (r18): the probe's
        # LIMIT-bounded collect truncates RESULT rows, not upstream
        # work — unbarriered, an over-gate graph paid the candidate
        # pipeline's shuffle map stages in the probe and then re-paid
        # the WHOLE pipeline in the distributed loop (twice, via the
        # union's two branches). The lazy localCheckpoint materializes
        # pairs exactly once at the probe's first action; the probe,
        # the loop's union, and the per-round joins all read the
        # checkpoint. Evaluate-once pinned by
        # tests/test_operators.py::test_cc_over_gate_single_evaluation.
        pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
        p_rows = _probe_local(pairs, local_max_edges)
        n_rows = (
            _probe_local(nodes.select(id_col).distinct(), local_max_edges)
            if p_rows is not None
            else None
        )
        if p_rows is not None and n_rows is not None:
            node_ids = {r[0] for r in n_rows}
            labels = _uf_min_labels(
                ((r[0], r[1]) for r in p_rows), node_filter=node_ids
            )
            if stats is not None:
                stats["rounds"] = 0
            sess = nodes.sparkSession
            dt = nodes.schema[0].dataType.simpleString()
            return sess.createDataFrame(
                sess.sparkContext.parallelize(
                    [(n, labels.get(n, n)) for n in sorted(node_ids)], 4
                ),
                schema=f"id {dt}, cluster_id {dt}",
            )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    edges = edges.persist()
    id_col = nodes.columns[0]
    labels = (
        nodes.select(F.col(id_col).alias("id")).distinct().withColumn("label", F.col("id"))
    )
    if stats is not None:
        stats["rounds"] = 0
    for _ in range(max_iter):
        nmin = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("label").alias("nl"))
            .groupBy("id")
            .agg(F.min("nl").alias("nmin"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(nmin, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("old_label"), F.coalesce(F.col("nmin"), F.col("old_label"))
                ).alias("label"),
                "old_label",
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.drop("old_label")
        if stats is not None:
            stats["rounds"] += 1
        if changed == 0:
            break
    else:
        # Silent non-convergence would split one component into several
        # cluster_ids with no signal — fail loudly instead (a >max_iter
        # diameter means the caller should raise max_iter or switch to
        # the large-star/small-star variant).
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            f"max_iter"
        )
    edges.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))


def _star_canon(e: DataFrame) -> DataFrame:
    # undirected edge set, canonical (small, large) orientation
    return (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = und.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return _star_canon(
        und.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    # operate on (big <- small) direction: for each node u, link its
    # smaller neighbors and u itself to the minimum of them
    directed = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    linked = directed.join(m, "u").select(
        F.col("v").alias("src"), F.col("m").alias("dst")
    )
    self_link = m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return _star_canon(linked.union(self_link))


def star_round(e: DataFrame, materialize: bool = True) -> DataFrame:
    """One large-star + small-star contraction round — module-level so
    the per-round plan shape (the thing that repeats O(log n) times at
    scale) can be budgeted by tools/plancheck.py and tested without
    running the full fixpoint loop.

    ``materialize=True`` (the loop's setting) localCheckpoints the
    large-star output before the small-star phase: ``_small_star`` reads
    its input in TWO branches (the neighborhood-min aggregate and the
    re-attach join), and Catalyst does not share subtrees across join
    branches, so the unmaterialized composition executes the entire
    3-Exchange large-star plan twice — 11 Exchanges per round measured
    vs 3 + 4 with the barrier. Pass ``materialize=False`` only to
    inspect the fused single-DAG plan."""
    mid = _large_star(e)
    if materialize:
        mid = mid.localCheckpoint(eager=True)
    return _small_star(mid)


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iter: int = 20,
    stats: dict | None = None,
    local_max_edges: int = _CC_LOCAL_MAX,
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — same contract as ``connected_components`` but converging in
    O(log n) rounds instead of O(component diameter), the right variant
    when clusters can be long chains (URL redirect graphs, citation
    chains) rather than the shallow blobs near-dup clusters form.

    Both phases are pure DataFrame ops with NO per-node neighbor lists
    (a ``collect_list`` would melt on high-degree hubs): the neighborhood
    minimum is a hash aggregate, re-attached by a keyed join, plus the
    canonical-orientation distinct — 3 (large) + 4 (small) Exchanges per
    round regardless of skew, budget-enforced in tools/plancheck.py; the
    large-star output is materialized between phases so the small-star's
    two consumer branches don't execute the large-star plan twice.

    - large-star: every node u links its LARGER neighbors to
      m(u) = min(N(u) ∪ {u}).
    - small-star: every node u links its smaller-or-equal neighbors and
      itself to m(u) = min(N≤(u) ∪ {u}).

    Fixpoint detection compares (count, hash-sum) of the edge set between
    rounds — one tiny aggregate, no driver-side edge sets. On
    convergence the edges form stars rooted at each component's min id;
    singletons from ``nodes`` label themselves. Returns (id, cluster_id);
    pass ``stats`` (a dict) to receive ``{"rounds": N}`` — bench.py
    records it at sf1 to substantiate the O(log n) convergence claim
    (that caller passes ``local_max_edges=0`` so the witness always
    exercises the distributed loop; rounds == 0 means the driver-local
    union-find twin answered, see ``_CC_LOCAL_MAX``).
    """
    id_col0 = nodes.columns[0]
    if (
        local_max_edges > 0
        and pairs.schema["id_a"].dataType.simpleString() in _CC_LOCAL_TYPES
        and pairs.schema["id_b"].dataType.simpleString() in _CC_LOCAL_TYPES
    ):
        # Same probe barrier as connected_components (r18): materialize
        # the pair stream once; an over-gate fall-through feeds
        # _star_canon from the checkpoint instead of re-running the
        # candidate pipeline.
        pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
        p_rows = _probe_local(pairs, local_max_edges)
        if p_rows is not None:
            # star contraction spans ALL edge endpoints (contrast the
            # label-propagation variant, which only relays through ids
            # present in ``nodes``) — no node filter here, and the
            # converged star edges are reproduced as (member -> root)
            # rows feeding the SAME left-join + coalesce attach the
            # distributed loop ends with.
            labels = _uf_min_labels((r[0], r[1]) for r in p_rows)
            if stats is not None:
                stats["rounds"] = 0
            sess = nodes.sparkSession
            dt = pairs.schema["id_a"].dataType.simpleString()
            roots = sess.createDataFrame(
                sess.sparkContext.parallelize(
                    sorted((n, r) for n, r in labels.items() if n != r),
                    4,
                ),
                schema=f"id {dt}, cluster_id {dt}",
            )
            return (
                nodes.select(F.col(id_col0).alias("id"))
                .distinct()
                .join(roots, "id", "left")
                .select(
                    "id", F.coalesce("cluster_id", "id").alias("cluster_id")
                )
            )

    edges = _star_canon(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).localCheckpoint(eager=True)

    def _fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: 2^63-magnitude hash values would overflow a
            # LongType sum under ANSI semantics
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = _fingerprint(edges)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        new_edges = star_round(edges, materialize=True).localCheckpoint(
            eager=True
        )
        new_fp = _fingerprint(new_edges)
        edges, prev_fp, fp = new_edges, fp, new_fp
        if new_fp == prev_fp:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            f"rounds — raise max_iter (expected rounds ~ log(component size))"
        )

    if stats is not None:
        # observability for scale benchmarks: rounds should track
        # O(log max-component-size), and the claim is checkable only if
        # the loop reports what it actually did
        stats["rounds"] = rounds

    id_col = nodes.columns[0]
    # converged canonical edges are (component-min root, member)
    roots = edges.select(F.col("dst").alias("id"), F.col("src").alias("cluster_id"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .distinct()
        .join(roots, "id", "left")
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )


def deletion_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """FastSS deletion neighborhood for edit distance 1: a string's
    signatures are itself plus every single-character deletion. Two
    strings within edit distance 1 necessarily share a signature
    (substitution: delete the differing position from both; indel: the
    shorter string IS a deletion of the longer), so candidate pairs come
    from a plain equi-join on the signature — the shuffle key spreads over
    the whole signature space and no all-pairs product ever forms."""
    sigs = F.expr(
        f"array_union(array({text_col}), "
        f"transform(sequence(1, length({text_col})), "
        f"i -> concat(substr({text_col}, 1, i - 1), "
        f"substr({text_col}, i + 1, length({text_col})))))"
    )
    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt"), F.explode(sigs).alias("sig")
    )


def edit_distance_pairs(
    df: DataFrame, text_col: str, id_col: str, max_dist: int = 1
) -> DataFrame:
    """Pairs of rows whose ``text_col`` values are within edit distance
    ``max_dist``, exact-verified with ``levenshtein``. The deletion-
    neighborhood candidate scheme is complete only for max_dist == 1
    (FastSS generalizes via recursive deletions but the signature count
    grows as len^d); larger distances are rejected rather than silently
    dropping pairs — same contract as hamming_pairs."""
    if max_dist != 1:
        raise ValueError(
            f"deletion-signature candidates are complete only for "
            f"max_dist=1 (got {max_dist})"
        )
    # Consume-once barrier (the embedding_near_dup / lsh_candidates
    # pattern): both self-join sides consume the deletion-neighborhood
    # explode — O(len) signature strings per row — and Catalyst does not
    # share subtrees across join branches, so without materialization the
    # neighborhood generation runs twice over the corpus. Measured
    # wall-NEUTRAL at bench scale (short keys, idle host overlaps the two
    # branches); kept for the halved resource term, which grows with key
    # length (the neighborhood is O(len^2) bytes per string).
    s = deletion_signatures(df, text_col, id_col).localCheckpoint(eager=False)
    a = s.select(F.col("id").alias("id_a"), F.col("txt").alias("ta"), "sig")
    b = s.select(F.col("id").alias("id_b"), F.col("txt").alias("tb"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ta", "tb")
        .distinct()
        .withColumn("dist", F.levenshtein("ta", "tb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )


def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_tokens: int = 50,
    stride: int = 1,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Cross-document repeated token spans — substring-level exact dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022, finds 50+-token verbatim repeats that doc-level
    dedup misses: licenses, templates, quoted passages).

    Every ``span_tokens``-token window at every ``stride`` offset is
    hashed (xxhash64 of the joined tokens — the 64-bit space makes
    cross-doc collisions negligible at corpus scale and keeps the
    shuffle rows narrow); windows whose hash occurs under more than one
    document are reported as (id, start_tok, span_hash, n_docs). The
    suffix-array construction of the paper is replaced by the hash
    group-by because Spark's partial aggregation gives the same
    O(total windows) cost without a global sort, and the downstream
    consumer (cut or drop the span) only needs positions, not the
    lexicographic order.

    stride=1 is the paper's exactness (any repeat >= span_tokens long is
    caught at every alignment); stride=span_tokens degrades to the
    line-level boilerplate shape (cheaper, alignment-sensitive). Window
    rows are O(tokens/stride) — at stride=1 the explode is the same
    volume as a token explode, and the only shuffles are the span-hash
    count and the report join, both (hash, long) narrow. Measured
    (local[32], stride=1, span=50): 5k docs 4.8 s cold, 50k docs 2.3 s
    warm — linear-at-worst in corpus tokens, as the shape predicts.

    ``hasher="md5"`` swaps the span hash for md5 hex — wider shuffle rows
    (32 bytes vs 8), kept only so a SQL oracle without xxhash64 (DuckDB)
    can replay the exact computation; production stays on xxhash64."""
    toks = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), r"\s+").alias("__a")
    ).filter(F.size("__a") >= span_tokens)
    n_spans = F.floor(
        (F.size("__a") - F.lit(span_tokens)) / F.lit(stride)
    ).cast("int") + F.lit(1)
    hash_fn = {"xxhash64": F.xxhash64, "md5": F.md5}[hasher]
    spans = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.struct(
                    (i * stride).alias("start_tok"),
                    hash_fn(
                        F.array_join(
                            F.slice("__a", i * stride + 1, span_tokens), " "
                        )
                    ).alias("span_hash"),
                ),
            )
        ).alias("__s"),
    ).select("id", F.col("__s.start_tok"), F.col("__s.span_hash"))
    counts = spans.groupBy("span_hash").agg(
        F.count_distinct("id").alias("n_docs")
    )
    return spans.join(counts.filter(F.col("n_docs") > 1), "span_hash").select(
        "id", "start_tok", "span_hash", "n_docs"
    )


def line_hashes(
    df: DataFrame, text_col: str, id_col: str, line_tokens: int = 20
) -> DataFrame:
    """(id, h) md5 hashes of non-overlapping ``line_tokens``-token lines —
    the unit of CCNet-style line-level boilerplate scoring (the same
    construction q_text_boilerplate inlines; md5 because the registered
    query's DuckDB oracle must hash identically). Narrow 1->N, no
    shuffle."""
    toks = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), r"\s+").alias("__a")
    )
    n_lines = F.greatest(
        F.ceil(F.size("__a") / F.lit(float(line_tokens))).cast("long"), F.lit(1)
    )
    hashes = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.md5(
            F.array_join(F.slice("__a", i * line_tokens + 1, line_tokens), " ")
        ),
    )
    return toks.select("id", F.explode(hashes).alias("h"))


def append_line_counts(batch_lines: DataFrame, index_path: str, batch_id) -> None:
    """Append a batch's line-hash counts as a delta partition of the
    persisted line index — the LSM shape of the LSH band index: ingest
    cost is one batch-sized aggregate + write, NEVER an index rewrite.
    Readers sum across deltas; ``compact_line_index`` folds them."""
    (
        batch_lines.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .write.mode("overwrite")
        .parquet(f"{index_path}/batch={batch_id}")
    )


def compact_line_index(spark, index_path: str) -> None:
    """Fold all delta partitions into one (h, cnt) baseline — the
    maintenance pass that bounds read amplification. Scores before and
    after are identical (sum is associative); pytest asserts it."""
    folded = (
        spark.read.parquet(index_path)
        .groupBy("h")
        .agg(F.sum("cnt").alias("cnt"))
    )
    tmp = index_path.rstrip("/") + "__compact"
    folded.write.mode("overwrite").parquet(f"{tmp}/batch=compacted")
    import shutil

    shutil.rmtree(index_path)
    shutil.move(tmp, index_path)


def boilerplate_against(
    batch_lines: DataFrame, spark, index_path: str
) -> DataFrame:
    """Per-doc line-duplication score for a batch against the persisted
    index (which must already include the batch's own delta, so scores
    equal a full recompute over corpus-so-far ∪ batch — parity-tested).

    Scale: the index read is an (h, cnt) scan summed per key — partial
    aggregation collapses the hot boilerplate keys map-side; the join
    against the batch's lines is batch-sized on one side. Cost tracks
    the index only through the linear delta scan, which compaction
    bounds."""
    counts = (
        spark.read.parquet(index_path)
        .groupBy("h")
        .agg(F.sum("cnt").alias("occ"))
    )
    dup = F.when(F.col("occ") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        batch_lines.join(counts, "h")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(dup).cast("long").alias("n_dup_lines"),
        )
    )
