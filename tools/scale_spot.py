"""One-off sf10 scale spot-check: 100x the driver's bench scale.

The per-round bench (bench.py) proves sublinearity at sf1 (10x). This
tool answers the next decade: it replicates the .bench_sf1 tables 10x
more (500k documents, disjoint id spaces, replica tokens re-prefixed so
no shingles are shared across replicas — same construction as
bench.py's ensure_scaleup_tables) and runs the shuffle-bound corpus
plans once at sf10 vs sf1 in the same session.

Not part of the per-round driver bench (it would triple its wall time);
run manually, paste the JSON into the commit/SURVEY. Usage:

    python tools/scale_spot.py [n_runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 10
_ID_OFFSET = 100_000_000  # sf1 ids reach ~9e7; replicas live in 1e8 decades

QUERIES = [
    "q_dedup_near_capped",
    "q_dedup_simhash_capped",
    "q_pack_sequences",
    "q_text_boilerplate",
    "q_doc_ids",
    "q_pipeline_e2e",
    # added r6: the third dedup modality on its Arrow signature path
    # (perf-weak in r5, fixed r6 — this is its 100x-scale witness) and
    # the per-source health report's digest-join/aggregate chain
    "q_dedup_embedding_lsh",
    "q_corpus_report",
    # added r7: the ANN family's 100x witness (the one Tier C pillar
    # without one) — IVFADC's nprobe bucket restriction and SQ8's
    # full-scan-but-compressed contract, each with a candidate audit
    "q_sim_ivfpq",
    "q_sim_sq8",
    # added r7: the SemDeDup modality (k scales with the corpus to hold
    # cluster size ~250, so the within-cluster quadratic term is ~N*250)
    "q_dedup_semantic",
]


def ensure_sf10(spark, sf1_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    # v2: embeddings replicated too (r7, the ANN scale rows), each
    # replica deterministically perturbed so replicas are near but not
    # bit-identical neighbors
    marker = os.path.join(out_dir, f"_REPLICAS_{REPLICAS}_v2_OK")
    if os.path.exists(marker):
        return
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    def replicate(name: str, id_cols: list[str], text_col: str | None) -> None:
        base = spark.read.parquet(os.path.join(sf1_dir, f"{name}.parquet"))
        parts = []
        for i in range(REPLICAS):
            r = base
            for c in id_cols:
                r = r.withColumn(c, F.col(c) + F.lit(i * _ID_OFFSET))
            if text_col and i > 0:
                # prefix every token again (s<i>): sf10 replicas share no
                # shingles with each other or with the sf1 originals, so
                # the near-dup structure is sf1's, 10 times over
                r = r.withColumn(
                    text_col,
                    F.array_join(
                        F.transform(
                            F.split(F.col(text_col), " "),
                            lambda w: F.concat(F.lit(f"s{i}"), w),
                        ),
                        " ",
                    ),
                )
                if "n_chars" in r.columns:
                    r = r.withColumn("n_chars", F.length(F.col(text_col)))
            if "embedding" in r.columns and i > 0:
                # deterministic per-replica perturbation (bounded +-0.05):
                # keeps the corpus distribution (same coarse structure)
                # without 10 bit-identical copies of every vector, which
                # would degenerate every ANN tie-break
                r = r.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, j: x
                        + F.lit(0.05)
                        * F.sin(
                            F.col(id_cols[0]).cast("double") * F.lit(7.0)
                            + j.cast("double") * F.lit(13.0)
                            + F.lit(float(i) * 29.0)
                        ),
                    ),
                )
            parts.append(r)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    replicate("documents", ["doc_id"], "text")
    replicate("events", ["event_id", "user_id"], None)
    replicate("embeddings", ["vec_id"], None)
    with open(marker, "w") as f:
        f.write("ok\n")


def ann_candidate_audit(spark, data_dir: str) -> dict:
    """The measured half of the 'nprobe restricts the scan' claim: for
    the q_sim_ivfpq operating point (n_clusters=8, nprobe=2, probes =
    vec_id < 20), how many code rows does each probe actually scan?
    Computed from the index itself — bucket histogram + each probe's
    nprobe-nearest coarse buckets (8 centroids x 20 probes: driver-side
    numpy is the honest tool-code shape). SQ8 is full-scan by design,
    so its 'candidates' ARE the corpus — reported for contrast."""
    import numpy as np
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark.operators import similarity as S
    from kafka_map_reduce_spark.sources import load_table

    e = load_table(spark, data_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 20)
    probes = e.filter(F.col("vec_id") < 20)
    coarse, _books, encoded = S.ivfpq_index(
        corpus, n_clusters=8, m=8, n_codes=16, iters=3
    )
    sizes = {r["bkt"]: r["n"] for r in
             encoded.groupBy("bkt").agg(F.count(F.lit(1)).alias("n")).collect()}
    cents = sorted(
        (r["cluster_id"], np.asarray(r["centroid"], dtype=float))
        for r in coarse.collect()
    )
    n_corpus = sum(sizes.values())
    cands = []
    for r in probes.select("vec_id", "embedding").collect():
        v = np.asarray(r["embedding"], dtype=float)
        d = sorted((float(np.sum((v - c) ** 2)), cid) for cid, c in cents)
        cands.append(sum(sizes.get(cid, 0) for _, cid in d[:2]))
    return {
        "corpus_vectors": n_corpus,
        "ivfpq_avg_candidates_per_probe": round(sum(cands) / len(cands), 1),
        "ivfpq_max_candidates_per_probe": max(cands),
        "ivfpq_scan_fraction": round(sum(cands) / len(cands) / n_corpus, 4),
        "sq8_candidates_per_probe": n_corpus,  # full quantized scan by design
        "bucket_sizes": {int(k): int(v) for k, v in sorted(sizes.items())},
    }


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.registry import all_queries

    spark = get_session(
        "scale-spot",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    sf1_dir = os.path.join(REPO, ".bench_sf1")
    if not os.path.exists(sf1_dir):
        print("run bench.py first to build .bench_sf1", file=sys.stderr)
        return 1
    sf10_dir = os.path.join(REPO, ".bench_sf10")
    t0 = time.time()
    ensure_sf10(spark, sf1_dir, sf10_dir)
    build_s = round(time.time() - t0, 1)

    specs = all_queries()

    def run_set(data_dir: str) -> dict:
        times = {}
        for name in QUERIES:
            best = None
            for _ in range(n_runs):
                t = time.time()
                specs[name].fn(spark, data_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
        return times

    sf1_times = run_set(sf1_dir)
    sf10_times = run_set(sf10_dir)
    result = {
        "metric": "sf10_scale_spot",
        "replicas_of_sf1": REPLICAS,
        "n_docs": 500_000,
        "runs_per_query": n_runs,
        "estimator": "min",
        "table_build_sec": build_s,
        "sf1": sf1_times,
        "sf10": sf10_times,
        "scaleup_ratio_10x_data": {
            q: round(sf10_times[q] / sf1_times[q], 2)
            for q in QUERIES
            if sf1_times[q] > 0
        },
        "ann_candidate_audit": {
            "sf1": ann_candidate_audit(spark, sf1_dir),
            "sf10": ann_candidate_audit(spark, sf10_dir),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
