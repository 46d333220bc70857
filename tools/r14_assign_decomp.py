"""r14 decomposition of the 16M-doc semantic assign+index stage
(r13 verdict item #5).

SCALE_SPOT_r13 measured assign+index at 43.3 s for 16M docs — 5.0x per
3.2x N where the routed argmin's O(N*sqrt(k)) predicts 4.1x — and
attributed the residual to index WRITE volume without splitting the
stage. This tool splits it and prices the candidate thin-index layout:

Stage walls per corpus point (sf5m / sf16m, same .bench_semcap corpora
and the r13 protocol: fresh session per point, parquet-spill
materialization, 48g heap):

- ``argmin_noop``     assign only, noop sink — the pure routed-argmin
                      compute term.
- ``thin_write``      assign -> (id, bkt) parquet — the candidate
                      layout's index write (argmin + ~12 B/row write).
- ``fat_noop``        assign -> unit-normalize -> (id, bkt, __vn), noop
                      sink — compute incl. the normalize, no encode.
- ``full_ingest``     the EXACT r13 stage (semantic_dedup_ingest empty
                      face + parquet write of (id, bkt, __vn)) — must
                      reproduce ~43.3 s at 16M / ~8.6 s at 5M.

Derived terms: write_vector_index = full_ingest - fat_noop;
normalize = fat_noop - argmin_noop; thin write cost = thin_write -
argmin_noop.

Then the PAIR stage under both layouts, governed (max_pairs = 4*cap):

- ``pairs_full``  the r13 protocol on the carried-vector index.
- ``pairs_thin``  (id, bkt) index joined back to the embedding table on
                  id + re-normalized, then the same kernel — the cost
                  the thin layout DEFERS into pair time (a corpus-wide
                  shuffle join of fat rows).

Output fingerprints (count + sum(id_a) + sum(id_b) + sum(floor(sim*1e4)))
must match across layouts: the kernel sorts by id internally, so pair
output is content-deterministic regardless of input row order.

Adoption question this answers: is (id, cluster_id)-only the better
index layout at the 16M+ regime, or does re-deriving vectors at pair
time cost more than carrying them? (The answer feeds the operator
docstring either way.)

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/r14_assign_decomp.py
Optional: SEMCAP_POINTS=sf16m (default "sf5m,sf16m").
Embeddings reuse .bench_semcap/tmp/emb_<label> from the r13 e2e run
(rebuilt via the same attach_hash_embed_arrow face if missing).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

THRESHOLD = 0.85


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    # Multi-point single-process tool (per-point get_session is NOT
    # isolation — local-mode spark.stop() leaves the gateway JVM
    # alive): default the 48g belt per the one-JVM-per-point rule,
    # SCALE_SPOT_r14 heap_cliff_r14. Must precede the package import
    # (session.py reads the env var at import time).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import similarity as S

    semcap = os.path.join(REPO, ".bench_semcap")
    tmp = os.path.join(semcap, "tmp")
    points = tuple(os.environ.get("SEMCAP_POINTS", "sf5m,sf16m").split(","))
    result: dict = {"metric": "r14_assign_decomp", "round": 14, "points": {}}

    for label in points:
        emb_path = os.path.join(tmp, f"emb_{label}")
        spark = get_session(
            f"r14-assign-decomp-{label}",
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
        )
        if not os.path.exists(emb_path):
            from r12_semantic_spot import ensure_corpora
            from kafka_map_reduce_spark.operators.text import (
                attach_hash_embed_arrow,
            )

            dirs = ensure_corpora(
                spark, os.path.join(REPO, ".bench_sf1"), semcap
            )
            docs = spark.read.parquet(
                os.path.join(dirs[label], "documents.parquet")
            )
            (
                attach_hash_embed_arrow(docs, "text", "embedding", dim=32)
                .select(F.col("doc_id").alias("vec_id"), "embedding")
                .write.mode("overwrite")
                .parquet(emb_path)
            )
        emb = spark.read.parquet(emb_path)
        n = emb.count()
        k, mod, cap = S.semantic_model_params(n)

        # train (context + the model every variant shares)
        t0 = time.time()
        cents = S.kmeans_fit(
            S._hash_mod_filter(emb, "vec_id", mod),
            k, iters=3, vec_col="embedding", id_col="vec_id", init="spread",
        ).localCheckpoint(eager=True)
        train_sec = round(time.time() - t0, 1)
        cents_rows = cents.collect()
        sc = spark.sparkContext

        def assigned_df():
            base = emb.select(
                F.col("vec_id").alias("id"),
                S._as_double(F.col("embedding")).alias("__v"),
            )
            assign = S._assign_model(cents_rows, sc=sc)
            return base.withColumn("bkt", assign(F.col("__v")))

        unit = S._normalize_arrow()
        row: dict = {
            "n_docs": n, "k": k, "train_sample_mod": mod,
            "max_cluster_size": cap, "train_sec": train_sec,
        }

        def timed(fn) -> float:
            # min-of-3: the decomposition subtracts these walls from
            # each other, so each must be a steady-state estimate — the
            # first run of this tool timed variants once in sequence and
            # the cold-first variant (Arrow worker fork + cold page
            # cache) came out ABOVE its own supersets, driving derived
            # terms negative.
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return round(best, 1)

        # untimed warm-up: fork the Arrow workers, ship the centroid
        # broadcast, warm the parquet page cache — none of which is the
        # stage cost being decomposed
        assigned_df().select("id", "bkt").write.mode("overwrite").format(
            "noop"
        ).save()

        # v0: pure argmin compute
        row["argmin_noop_sec"] = timed(
            lambda: assigned_df().select("id", "bkt")
            .write.mode("overwrite").format("noop").save()
        )
        # v1: the thin-index write
        thin_path = os.path.join(tmp, f"index_thin_{label}")
        row["thin_write_sec"] = timed(
            lambda: assigned_df().select("id", "bkt")
            .write.mode("overwrite").parquet(thin_path)
        )
        # v3: full compute (argmin + normalize), no encode
        row["fat_noop_sec"] = timed(
            lambda: assigned_df()
            .select("id", "bkt", unit(F.col("__v")).alias("__vn"))
            .write.mode("overwrite").format("noop").save()
        )
        # v2: the EXACT r13 stage (ingest empty face + fat parquet write)
        full_path = os.path.join(tmp, f"index_full_{label}")
        empty = spark.createDataFrame([], "id long, bkt int, __vn array<double>")

        def full_ingest():
            _, index = S.semantic_dedup_ingest(
                emb, cents, empty, threshold=THRESHOLD, max_cluster_size=cap
            )
            index.write.mode("overwrite").parquet(full_path)

        row["full_ingest_sec"] = timed(full_ingest)
        row["index_bytes"] = {
            "thin": _dir_bytes(thin_path), "full": _dir_bytes(full_path)
        }
        row["derived_sec"] = {
            "normalize": round(row["fat_noop_sec"] - row["argmin_noop_sec"], 1),
            "vector_index_write": round(
                row["full_ingest_sec"] - row["fat_noop_sec"], 1
            ),
            "thin_index_write": round(
                row["thin_write_sec"] - row["argmin_noop_sec"], 1
            ),
        }
        print(json.dumps({"progress": f"{label}-index", **row}), file=sys.stderr)

        # ---- pairs under both layouts (governed; r13 spill protocol) ----
        kernel = S._bucket_pairs_fn(THRESHOLD, max_pairs=4 * cap)
        raw_path = os.path.join(tmp, "pairs_raw")

        def run_pairs(src_df, runs: int = 3) -> tuple:
            # min-of-3, same reasoning as timed(). PROTOCOL NOTE: the
            # spill-before-sort + floor-round body is a frozen replica
            # of tools/r13_semantic_e2e.py timed_pairs (the canonical
            # copy) — see the note in tools/r14_heap_cliff.py.
            wall = float("inf")
            for _ in range(runs):
                t0 = time.time()
                src_df.groupBy("bkt").applyInPandas(
                    kernel, "id_a long, id_b long, sim double"
                ).write.mode("overwrite").parquet(raw_path)
                raw = spark.read.parquet(raw_path)
                raw.select(
                    "id_a", "id_b",
                    (F.floor(F.col("sim") * 10000 + F.lit(0.5)) / F.lit(10000))
                    .alias("sim"),
                ).orderBy("id_a", "id_b").write.mode("overwrite").format(
                    "noop"
                ).save()
                wall = min(wall, round(time.time() - t0, 1))
            fp = spark.read.parquet(raw_path).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("id_a").alias("sa"),
                F.sum("id_b").alias("sb"),
                F.sum(F.floor(F.col("sim") * 10000 + F.lit(0.5))).alias("ss"),
            ).collect()[0]
            return wall, [int(fp["n"]), int(fp["sa"]), int(fp["sb"]), int(fp["ss"])]

        full_idx = spark.read.parquet(full_path)
        row["pairs_full_sec"], fp_full = run_pairs(full_idx)

        thin_idx = spark.read.parquet(thin_path)
        rederived = (
            thin_idx.join(
                emb.select(
                    F.col("vec_id").alias("id"),
                    S._as_double(F.col("embedding")).alias("__v"),
                ),
                "id",
            ).select("id", "bkt", unit(F.col("__v")).alias("__vn"))
        )
        row["pairs_thin_sec"], fp_thin = run_pairs(rederived)
        # same-session drift witness (the r13 A/B protocol): if the
        # full layout re-run after thin lands near thin's wall, the
        # full-vs-thin gap was session drift, not layout. min-of-3
        # since r15 (ADVICE r14 #4): the r14 artifact's single-run
        # witness showed ~19% drift at sf16m — larger than the 71.5 vs
        # 73.5 s totals gap it was arbitrating — so the recorded
        # totals comparison is WITHIN NOISE; the thin-layout rejection
        # rests on the structural arguments (fat-write volume ≈ 0 and
        # the O(corpus)-per-batch join a thin index re-introduces into
        # ingest), not on the totals. A future re-run's witness now
        # uses the same estimator as the walls it arbitrates.
        row["pairs_full_rerun_sec"], _ = run_pairs(full_idx)
        row["totals_note"] = (
            "carried-vs-thin totals are within session noise "
            "(drift witness ~19% at sf16m, r14); rejection rests on "
            "write-volume + standing-index arguments"
        )
        row["pair_fingerprints_match"] = fp_full == fp_thin
        row["pair_fingerprint"] = fp_full
        row["totals_sec"] = {
            "carried_vector_layout": round(
                row["full_ingest_sec"] + row["pairs_full_sec"], 1
            ),
            "thin_layout": round(
                row["thin_write_sec"] + row["pairs_thin_sec"], 1
            ),
        }
        result["points"][label] = row
        print(json.dumps({"progress": f"{label}-pairs", **row}), file=sys.stderr)
        spark.stop()

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
