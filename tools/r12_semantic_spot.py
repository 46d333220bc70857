"""r12 semantic-family measurements (r11 verdict items #1/#4 + ADVICE high).

Three questions, one corpus:

1. ``kcap_train_r12`` — the k-cap boundary witness (verdict #4): the one
   claim in the semantic family that was argued, not measured. At the
   semantic_model_params defaults the cap binds past ~8.2M docs
   (k_cap=2^15, target_cluster=250). This measures kmeans_fit at the
   production sizing at N = 5M (below the cap, k=20000 requested),
   10M and 16M (above it, k frozen at 32768, training sample frozen at
   ~50*2^15 rows up to integer-mod granularity). Claim under test:
   train_sec is ~flat across every above-cap N.

2. ``kcap_verify_r12`` — the cost the cap buys that flatness with: above
   the boundary expected cluster size grows as n/k_cap, so the
   within-cluster verify term is O(n * E[size]) = O(n^2/k_cap). The
   capped pair stage (the exact tail of q_dedup_semantic) is timed at
   all three N with cluster-size stats, and the measured slope is
   compared against the n*E[size] prediction.

3. ``pair_count_correction_r11`` — ADVICE r11 (high): the r11 spot's
   accumulator counted the pair kernel TWICE (the orderBy's range-
   partitioning sampling job re-executed the applyInPandas stage before
   the real shuffle), so SCALE_SPOT_r11 pair_cap_r11's n_pairs values
   (260,002,384 / 23,027,391) are ~2x the truth. The 5M corpus here is
   row-identical to the r11 .bench_sf100 build (the decade filter of
   the 320-replica table reproduces the replicas=100 build exactly:
   same per-replica id offsets and token prefixes), so re-running the
   uncapped-vs-capped A/B with the fixed exact counter (checkpoint
   before the sort — the kernel runs once) yields the corrected counts.

Corpus construction: 320 replicas of the sf1 documents table — same
values as tools/scale_spot.py ensure_sf10's loop (doc_id + i*1e8,
tokens prefixed s<i> for i>0, n_chars recomputed) but built with ONE
crossJoin against a replica-index range instead of a 320-branch union
(the ensure_relational pattern, scale_spot.py:873). N=10M and N=5M are
decade-filtered rewrites of the same frame.

Usage: python tools/r12_semantic_spot.py  (prints one JSON document;
sections stream to stderr as they finish)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_ID_OFFSET = 100_000_000  # replica i lives in decade i*1e8 (scale_spot.py)


# The corpus layout contract, shared with tools/r13_semantic_e2e.py's
# JVM-free _corpora_dirs (which must resolve point paths WITHOUT a
# session): one marker, one set of point keys. Changing either here
# changes both consumers together.
SEMCAP_MARKER = "_SEMCAP_320_OK"
SEMCAP_POINT_KEYS = ("sf16m", "sf10m", "sf5m")


def semcap_dirs(base: str) -> dict:
    """Point-name -> path mapping IF the build marker exists, else {}.
    Session-free by design (the marker IS the build receipt)."""
    if not os.path.exists(os.path.join(base, SEMCAP_MARKER)):
        return {}
    return {k: os.path.join(base, k) for k in SEMCAP_POINT_KEYS}


def ensure_corpora(spark, sf1_dir: str, base: str) -> dict:
    """Build .bench_semcap/{sf16m,sf10m,sf5m}/documents.parquet."""
    from pyspark.sql import functions as F

    out16 = os.path.join(base, "sf16m")
    out10 = os.path.join(base, "sf10m")
    out5 = os.path.join(base, "sf5m")
    done = semcap_dirs(base)
    if done:
        return done
    if os.path.exists(base):
        shutil.rmtree(base)
    for d in (out16, out10, out5):
        os.makedirs(d)
    docs = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet"))
    reps = spark.range(320).select(F.col("id").cast("int").alias("__rep"))
    rep = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep").cast("long") * F.lit(_ID_OFFSET))
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(F.lit("s"), F.col("__rep").cast("string"), w),
                    ),
                    " ",
                )
            ),
        )
    )
    if "n_chars" in docs.columns:
        rep = rep.withColumn("n_chars", F.length(F.col("text")))
    rep = rep.drop("__rep")
    # 64 output files: splittable scans at every downstream stage (the
    # single-row-group pathology this repo documents must not be
    # re-created in its own scale fixtures).
    rep.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out16, "documents.parquet")
    )
    full = spark.read.parquet(os.path.join(out16, "documents.parquet"))
    full.filter(F.col("doc_id") < F.lit(200 * _ID_OFFSET)).repartition(48).write.mode(
        "overwrite"
    ).parquet(os.path.join(out10, "documents.parquet"))
    full.filter(F.col("doc_id") < F.lit(100 * _ID_OFFSET)).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(out5, "documents.parquet"))
    with open(os.path.join(base, SEMCAP_MARKER), "w") as f:
        f.write("ok\n")
    return semcap_dirs(base)


def main() -> int:
    # Multi-point single-process tool (5M/10M/16M points in one
    # session): one JVM serves every corpus point (local-mode
    # spark.stop() is not isolation), so default the 48g heap belt —
    # the one-JVM-per-point rule, SCALE_SPOT_r14 heap_cliff_r14. Must
    # precede the package import (session.py reads the env var at
    # import time).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import similarity as S
    from kafka_map_reduce_spark.operators.text import attach_hash_embed_arrow

    spark = get_session(
        "r12-semcap-spot",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    sf1 = os.path.join(REPO, ".bench_sf1")
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        print(json.dumps({"err": ".bench_sf1 missing — run bench.py once first"}))
        return 1
    t0 = time.time()
    dirs = ensure_corpora(spark, sf1, os.path.join(REPO, ".bench_semcap"))
    result: dict = {
        "metric": "r12_semantic_spot",
        "round": 12,
        "corpus_build_sec": round(time.time() - t0, 1),
    }

    train_rows: dict = {}
    verify_rows: dict = {}
    points = (("sf5m", dirs["sf5m"]), ("sf10m", dirs["sf10m"]), ("sf16m", dirs["sf16m"]))
    tmp = os.path.join(REPO, ".bench_semcap", "tmp")
    for label, d in points:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        # parquet round-trip instead of localCheckpoint for the N-row
        # frames (emb, index below): deserialized heap-resident blocks
        # for three corpus-scale checkpoints OOM an 8-16g driver heap,
        # while columnar parquet re-reads are splittable and cheap —
        # the same materialization role without the heap residency.
        emb_path = os.path.join(tmp, f"emb_{label}")
        (
            attach_hash_embed_arrow(docs, "text", "embedding", dim=32)
            .select(F.col("doc_id").alias("vec_id"), "embedding")
            .write.mode("overwrite")
            .parquet(emb_path)
        )
        emb = spark.read.parquet(emb_path)
        n = emb.count()
        k, mod, cap = S.semantic_model_params(n)
        train = S._hash_mod_filter(emb, "vec_id", mod)
        n_train = train.count()
        t0 = time.time()
        cents = S.kmeans_fit(
            train, k, iters=3, vec_col="embedding", id_col="vec_id", init="spread"
        ).localCheckpoint(eager=True)
        train_sec = round(time.time() - t0, 1)
        k_eff = cents.count()
        train_rows[label] = {
            "n_docs": n,
            "k_requested": k,
            "k_effective": k_eff,
            "train_sample_rows": n_train,
            "train_sample_mod": mod,
            "train_sec": train_sec,
            "above_cap": k == S._SEMANTIC_K_CAP,
        }
        print(json.dumps({"progress": f"train {label}", **train_rows[label]}),
              file=sys.stderr)

        # ---- capped pair stage (the verify term) on the frozen model --
        empty = spark.createDataFrame([], "id long, bkt int, __vn array<double>")
        _, index = S.semantic_dedup_ingest(
            emb, cents, empty, threshold=0.85, max_cluster_size=cap
        )
        idx_path = os.path.join(tmp, f"index_{label}")
        index.write.mode("overwrite").parquet(idx_path)
        index = spark.read.parquet(idx_path)
        sizes = index.groupBy("bkt").count()
        stats = sizes.agg(
            F.avg("count").alias("avg"),
            F.expr("percentile(count, 0.99)").alias("p99"),
            F.max("count").alias("max"),
            F.count(F.lit(1)).alias("n_clusters"),
        ).collect()[0]

        def timed_pairs(max_pairs):
            acc = spark.sparkContext.accumulator(0)
            kernel = S._bucket_pairs_fn(0.85, max_pairs=max_pairs)

            # plain closure, NOT default-arg binding: applyInPandas
            # validates the function signature as exactly (data) or
            # (key, data) — extra defaulted params are rejected
            def counted(pdf):
                out = kernel(pdf)
                acc.add(len(out))
                return out

            t0 = time.time()
            raw = index.groupBy("bkt").applyInPandas(
                counted, "id_a long, id_b long, sim double"
            )
            # materialize BEFORE the orderBy: the range-sort's sampling
            # job would re-execute the kernel and double the count
            # (ADVICE r11 high — the r11 spot had exactly this bug).
            # Parquet spill, not localCheckpoint: the sf16m capped pair
            # stream is hundreds of millions of rows and heap-resident
            # checkpoint blocks OOM a 24g driver; the timing includes
            # the spill+re-read for every N point uniformly.
            raw_path = os.path.join(tmp, "pairs_raw")
            raw.write.mode("overwrite").parquet(raw_path)
            raw = spark.read.parquet(raw_path)
            raw.select(
                "id_a",
                "id_b",
                (F.floor(F.col("sim") * 10000 + F.lit(0.5)) / F.lit(10000)).alias(
                    "sim"
                ),
            ).orderBy("id_a", "id_b").write.mode("overwrite").format("noop").save()
            return round(time.time() - t0, 1), acc.value

        sec_cap, n_cap = timed_pairs(4 * cap)
        verify_rows[label] = {
            "n_docs": n,
            "max_cluster_size": cap,
            "cluster_avg": round(float(stats["avg"]), 1),
            "cluster_p99": round(float(stats["p99"]), 1),
            "cluster_max": int(stats["max"]),
            "n_clusters": int(stats["n_clusters"]),
            "pairs_capped_sec": sec_cap,
            "n_pairs_capped_exact": n_cap,
        }
        if label == "sf5m":
            sec_un, n_un = timed_pairs(None)
            verify_rows[label]["pairs_uncapped_sec"] = sec_un
            verify_rows[label]["n_pairs_uncapped_exact"] = n_un
        print(json.dumps({"progress": f"pairs {label}", **verify_rows[label]}),
              file=sys.stderr)

    result["kcap_train_r12"] = {
        **train_rows,
        "note": (
            "constant-in-N claim: every above-cap point trains on the "
            "frozen ~50*2^15-row sample at k=2^15 (sample size varies "
            "only with integer-mod granularity), so sf10m vs sf16m "
            "train_sec should be ~equal while n grows 1.6x; sf5m is the "
            "below-boundary baseline at its own k=n/250 sizing."
        ),
    }
    n5, n16 = verify_rows["sf5m"]["n_docs"], verify_rows["sf16m"]["n_docs"]
    s5 = verify_rows["sf5m"]["cluster_avg"]
    s16 = verify_rows["sf16m"]["cluster_avg"]
    result["kcap_verify_r12"] = {
        **verify_rows,
        "predicted_ratio_16m_over_5m_n_times_size": round(
            (n16 / n5) * (s16 / s5), 2
        ),
        "measured_ratio_16m_over_5m": round(
            verify_rows["sf16m"]["pairs_capped_sec"]
            / max(verify_rows["sf5m"]["pairs_capped_sec"], 1e-9),
            2,
        ),
        "note": (
            "the verify term the cap trades for constant training: "
            "O(n * E[cluster size]) = O(n^2/k_cap) above the boundary. "
            "n_pairs are EXACT (single kernel execution per timing — "
            "checkpoint before the range sort)."
        ),
    }
    result["pair_count_correction_r11"] = {
        "r11_recorded": {"uncapped": 260002384, "auto_cap": 23027391},
        "corrected_at_same_corpus": {
            "uncapped": verify_rows["sf5m"].get("n_pairs_uncapped_exact"),
            "auto_cap": verify_rows["sf5m"]["n_pairs_capped_exact"],
        },
        "note": (
            "the sf5m corpus here is row-identical to the r11 "
            ".bench_sf100 build (decade filter of the 320-replica "
            "frame = the replicas=100 loop build); the r11 accumulator "
            "double-counted through the orderBy sampling job. Timings "
            "are NOT comparable across the protocols (the corrected "
            "one materializes the pair frame before the sort). "
            "PROVENANCE: counts directly comparable to r11's index "
            "require the PRE-SALT trainer (commit d02f032 fixed the "
            "train-filter/spread-init hash correlation, which changes "
            "every mod>1 model) — the r11-comparable exact counts "
            "(230,792,804 / 24,256,493, reproduced twice) are recorded "
            "in SCALE_SPOT_r11.json correction_r12 and "
            "SCALE_SPOT_r12.json; a HEAD run of this script reports "
            "the FIXED model's counts instead."
        ),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
