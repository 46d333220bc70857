"""r14 plan-build sweep (r13 verdict item #4): generalize the simhash
discovery — wide Column-object expression trees cost driver-side py4j
plan-construction wall that is CONSTANT in data volume (poisons bench
SF, vanishes at 100 TB) — across the other wide builders the inventory
still constructs as Python Column loops:

- the 64-min MinHash aggregate + band projection (operators/dedup.py
  minhash_signatures / lsh_banded),
- the embedding-LSH literal-coefficient JVM expression
  (operators/similarity.py hyperplane_bucket — the Arrow face owns the
  hot path; the JVM face is the determinism pin + single-bucket uses),
- the Z-order bit-interleave (operators/maintenance.py _zvalue),
- the hash-embed fold (operators/text.py attach_hash_embed, both
  hashers).

Protocol (matches the r13 decomposition): each build is measured as
construct-the-DataFrame + force analysis (.schema) over a TINY input
(spark.range-derived, so executor work is nil and the wall is pure
driver py4j + Catalyst analysis), min-of-N after a warm-up rep.
Adoption contract from the brief: rewrite onto an F.expr face only
where the win is >= 2x of a >= 0.5 s build, bit-identity proven like
r13's. Anything under 0.5 s is recorded and left alone.

Usage: python tools/r14_planbuild_sweep.py   (one JSON doc on stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_RUNS = 5


def timed_build(fn) -> float:
    """Min-of-N wall of construct+analyze, one warm-up rep first."""
    fn().schema
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        fn().schema
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import dedup as D
    from kafka_map_reduce_spark.operators import similarity as S
    from kafka_map_reduce_spark.operators.maintenance import _zvalue
    from kafka_map_reduce_spark.operators.text import attach_hash_embed

    spark = get_session(
        "r14-planbuild", master="local[4]", shuffle_partitions=4
    )

    # Tiny typed stand-ins: analysis needs schemas, not data.
    shingled = (
        spark.range(4)
        .select(F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("s"))
    )
    sigs_cols = [F.col("id")] + [
        F.xxhash64(F.col("id"), F.lit(i)).alias(f"mh{i}") for i in range(64)
    ]
    sigs = spark.range(4).select(*sigs_cols)
    docs = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok tok2 "), F.col("id")).alias("text"),
    )
    vecs = spark.range(4).select(
        F.col("id"),
        F.array(*[F.rand(seed=7) for _ in range(32)]).alias("v"),
    )
    zin = spark.range(4).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") * 2).cast("double").alias("b"),
        F.lit(0.0).alias("__min_a"), F.lit(10.0).alias("__max_a"),
        F.lit(0.0).alias("__min_b"), F.lit(10.0).alias("__max_b"),
    )

    out: dict = {"metric": "r14_planbuild_sweep", "round": 14, "n_runs": N_RUNS}
    out["builds_sec"] = {
        "minhash_signatures_64": timed_build(
            lambda: D.minhash_signatures(shingled, 64)
        ),
        "lsh_banded_16x4": timed_build(lambda: D.lsh_banded(sigs, 64, 16)),
        "lsh_candidates_full": timed_build(lambda: D.lsh_candidates(sigs, 64, 16)),
        "hyperplane_bucket_jvm_b16_d32": timed_build(
            lambda: vecs.select(S.hyperplane_bucket(F.col("v"), 32, 16, 0))
        ),
        "zvalue_b16_k2": timed_build(
            lambda: zin.withColumn("__z", _zvalue(["a", "b"], 16))
        ),
        "attach_hash_embed_xxh_d32": timed_build(
            lambda: attach_hash_embed(docs, "text", dim=32)
        ),
        "attach_hash_embed_md5_d32": timed_build(
            lambda: attach_hash_embed(docs, "text", dim=32, hasher="md5")
        ),
        # the fixed simhash face, as the sweep's reference point
        "simhash_fexpr_face": timed_build(
            lambda: D.simhash(docs, "text", "doc_id")
        ),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
