"""r11 semantic-family scale measurements (verdict items #4/#5).

Two walls named in SCALE_SPOT_r10's diagnosis, both attacked in code this
round; this script produces the witnesses for SCALE_SPOT_r11:

1. ``train_r11`` — the Lloyd-training quadratic: kmeans_fit at the
   production sizing (semantic_model_params) over the 5M-doc corpus's
   1M-vector train slice, timed with the r11 routed-trainer dispatch vs
   the r10 flat path (forced by lifting _ROUTED_ASSIGN_MIN_K). The k-cap
   half of the fix binds only past ~8.2M docs (policy, pytest-pinned);
   the routed-trainer half is the measurable term at 5M.

2. ``pair_cap_r11`` — the pair-stream term: the within-cluster pair
   stage (groupBy(bkt) → _bucket_pairs_fn → round → sort → noop write,
   the exact tail of q_dedup_semantic) timed uncapped vs the auto
   governor (4× the size cap) on the same assigned index, plus the full
   registered q_dedup_semantic warm-protocol run at sf1/sf10/sf100 for
   the end-to-end number comparable with r10's 11.6/10.3/151.8 s.

Usage: python tools/r11_semantic_spot.py  (prints one JSON document)

PROVENANCE NOTE: the train_r11 A/B ran while kmeans_fit's Lloyd loop
dispatched through _assign_model (the commit before the measurement
landed) — it measured routed 40.8 s vs flat 29.9 s at the production
sizing, KILLING the routed-trainer hypothesis, after which kmeans_fit
was reverted to the flat kernel unconditionally. Re-running this script
against HEAD therefore measures flat twice in section 1 (the
_ROUTED_ASSIGN_MIN_K toggle no longer reaches the trainer); the A/B
numbers live in SCALE_SPOT_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    # Multi-point single-process tool: one JVM serves every corpus
    # point (local-mode spark.stop() is not isolation), so default the
    # 48g heap belt — the one-JVM-per-point rule, SCALE_SPOT_r14
    # heap_cliff_r14. Must precede the package import (session.py
    # reads the env var at import time).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from pyspark.sql import functions as F

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import similarity as S
    from kafka_map_reduce_spark.operators.text import attach_hash_embed_arrow
    from kafka_map_reduce_spark.registry import all_queries
    from kafka_map_reduce_spark.sources import load_table

    spark = get_session(
        "r11-semantic-spot",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    sf1 = os.path.join(REPO, ".bench_sf1")
    sf10 = os.path.join(REPO, ".bench_sf10")
    sf100 = os.path.join(REPO, ".bench_sf100")
    result: dict = {"metric": "r11_semantic_spot"}

    # ---- 1. training: routed vs flat at the 5M-doc production sizing --
    emb = (
        attach_hash_embed_arrow(
            load_table(spark, sf100, "documents"), "text", "embedding", dim=32
        )
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    n = emb.count()
    k, mod, cap = S.semantic_model_params(n)
    train = S._hash_mod_filter(emb, "vec_id", mod)
    n_train = train.count()
    timings = {}
    for label, min_k in (("routed_r11", S._ROUTED_ASSIGN_MIN_K), ("flat_r10", 1 << 30)):
        saved = S._ROUTED_ASSIGN_MIN_K
        S._ROUTED_ASSIGN_MIN_K = min_k
        try:
            t0 = time.time()
            cents = S.kmeans_fit(
                train, k, iters=3, vec_col="embedding", id_col="vec_id",
                init="spread",
            )
            k_eff = cents.count()  # checkpointed by kmeans_fit; count is free
            timings[label] = {
                "train_sec": round(time.time() - t0, 1),
                "k_effective": k_eff,
            }
        finally:
            S._ROUTED_ASSIGN_MIN_K = saved
    result["train_r11"] = {
        "n_docs": n,
        "k_requested": k,
        "train_sample_rows": n_train,
        "train_sample_mod": mod,
        **timings,
        "note": (
            "same corpus, sizing and seed; the only difference is the "
            "Lloyd loop's assignment kernel. The k-cap half of item #4 "
            "does not bind at 5M (cap starts at ~8.2M docs) — its "
            "witness is the pytest-pinned policy (training sample "
            "frozen at 50*2^15 rows past the cap, so train cost is "
            "CONSTANT in N there)."
        ),
    }
    print(json.dumps({"progress": "train done", **result["train_r11"]}), file=sys.stderr)

    # ---- 2. pair stage: uncapped vs auto governor on one index --------
    # Build the assigned unit-vector index ONCE with the frozen routed
    # model (ingest-against-empty is the build; same path the audits use).
    cents = S.kmeans_fit(
        train, k, iters=3, vec_col="embedding", id_col="vec_id", init="spread"
    ).localCheckpoint(eager=True)
    empty = spark.createDataFrame([], "id long, bkt int, __vn array<double>")
    _, index = S.semantic_dedup_ingest(
        emb, cents, empty, threshold=0.85, max_cluster_size=cap
    )
    index = index.localCheckpoint(eager=True)
    pair_rows = {}
    for label, max_pairs in (("uncapped", None), ("auto_cap", 4 * cap)):
        # one kernel pass per config (r11 review: a separate .count()
        # re-ran the whole U@U^T scoring — ~40 s of duplicated 5M-doc
        # work per config): count the noop-written stream via a row
        # accumulator inside the same kernel invocation instead.
        acc = spark.sparkContext.accumulator(0)
        kernel = S._bucket_pairs_fn(0.85, max_pairs=max_pairs)

        # plain closure (r12 fix): applyInPandas validates the function
        # signature as exactly (data) or (key, data); the old defaulted
        # extra params (_f=kernel, _acc=acc) are rejected by the
        # validator. kernel/acc are re-assigned just above inside this
        # loop iteration, so the closure binds the right pair.
        def counted_kernel(pdf):
            out = kernel(pdf)
            acc.add(len(out))
            return out

        t0 = time.time()
        raw = index.groupBy("bkt").applyInPandas(
            counted_kernel,
            "id_a long, id_b long, sim double",
        )
        # localCheckpoint BEFORE the orderBy (ADVICE r11 high): the
        # downstream RangePartitioning exchange runs a SAMPLING job that
        # would execute the kernel a second time, doubling acc.value
        # (the committed SCALE_SPOT_r11 n_pairs=260,002,384 was ~2x the
        # true count for exactly this reason). Checkpointing here means
        # the sampling job reads the materialized frame and the kernel
        # runs exactly once, making the accumulator exact — and the
        # timing still covers kernel + round + range-sort + write.
        raw = raw.localCheckpoint(eager=True)
        pairs = raw.select(
            "id_a",
            "id_b",
            (F.floor(F.col("sim") * 10000 + F.lit(0.5)) / F.lit(10000)).alias("sim"),
        ).orderBy("id_a", "id_b")
        pairs.write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 1)
        pair_rows[label] = {"pairs_round_sort_sec": dt, "n_pairs": acc.value}
    result["pair_cap_r11"] = {
        "n_docs": n,
        "max_cluster_size": cap,
        "auto_cap_pairs_per_cluster": 4 * cap,
        **pair_rows,
    }
    print(json.dumps({"progress": "pairs done", **result["pair_cap_r11"]}), file=sys.stderr)

    # ---- 3. full registered query, warm protocol ----------------------
    fn = all_queries()["q_dedup_semantic"].fn
    full = {}
    for label, d in (("sf1", sf1), ("sf10", sf10), ("sf100", sf100)):
        t0 = time.time()
        df = fn(spark, d)
        n_out = df.count()
        full[label] = {"sec": round(time.time() - t0, 1), "n_pairs": n_out}
    full["r10_comparison_sec"] = {"sf1": 11.6, "sf10": 10.3, "sf100": 151.8}
    full["ratio_last_decade_10x_data"] = round(
        full["sf100"]["sec"] / max(full["sf10"]["sec"], 1e-9), 2
    )
    result["full_query_warm_protocol_r11"] = full
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
