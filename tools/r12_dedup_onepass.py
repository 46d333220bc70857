"""r12 consume-once witness for the LSH/SimHash candidate generators.

The r12 change under test (operators/dedup.py): ``lsh_candidates`` and
``hamming_pairs`` fan their signature frames into up to four plan
branches (hot-bucket counts, the cap join, both pair-join sides), and
Catalyst does not share subtrees across join branches — the executed
plans carried 4 parquet scans / 4 signature aggregations, i.e. the
corpus would be tokenized and hashed FOUR times at 100 TB. A
consume-once ``localCheckpoint(eager=False)`` barrier on the banded /
block frames makes the expensive aggregation execute exactly once.

This script produces the SCALE_SPOT_r12 ``dedup_onepass_r12`` section:

- A-side = HEAD (barrier in place, the real operators).
- B-side = HEAD minus the barrier, obtained by patching
  ``localCheckpoint(eager=False)`` to identity ON THE INSTANCE'S CLASS
  (``pyspark.sql.classic.dataframe.DataFrame`` — patching the
  ``pyspark.sql.DataFrame`` base is a silent no-op in Spark 4 because
  the classic subclass overrides the method; the first version of this
  tool made exactly that mistake and measured barrier-vs-barrier).
  The only eager=False checkpoints in these pipelines are the two r12
  barriers, so the patch reproduces the pre-change plan exactly
  (``jaccard_verify``'s auto-prune checkpoint is eager=True, left live
  on both sides).
- Corpora: the .bench_sf1 documents replica (50k docs, 64 splittable
  files — fan_out_scan is a no-op, so the A/B isolates the barrier) and
  the sf0.1 bench table (5k docs, ONE row group — the regime the bench
  actually measures).
- Witness: min-of-3 wall per side for the two capped CANDIDATE
  generators (the stage the barrier changes), identical outputs, plus
  executed-plan counts on the candidate frame: the no-barrier plan
  carries 4 parquet scans / 14 HashAggregates, the barrier plan 0/6
  (checkpoint-truncated — the one materialization run is the subtree's
  only execution).

Expected shape (measured 2026-08-16, both reps): SimHash barrier wins
~1.4x at sf1 and ~1.2x at sf0.1; MinHash wins ~1.2x at sf0.1 and is
wall-NEUTRAL at sf1 — on an idle host the four branches recompute
CONCURRENTLY, so wall hides the 4x resource cost that the plan counts
prove. The structural claim (corpus tokenized once, not four times) is
the 100 TB argument; the wall numbers bound what it costs locally.

Usage: python tools/r12_dedup_onepass.py  (prints one JSON document)
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _plan_counts(df) -> dict:
    df.count()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "hash_aggregates": len(re.findall(r"HashAggregate", plan)),
        "parquet_scans": len(re.findall(r"Scan parquet", plan)),
        "generates": len(re.findall(r"Generate", plan)),
    }


def _result_hash(df) -> tuple[int, str]:
    rows = sorted(map(str, df.collect()))
    return len(rows), hashlib.md5(str(rows).encode()).hexdigest()


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401 (session warmup)

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import dedup as D
    from kafka_map_reduce_spark.sources.tables import fan_out_scan, load_table

    spark = get_session(
        "r12-dedup-onepass",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32")),
    )
    sf1 = os.path.join(REPO, ".bench_sf1")
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        print(json.dumps({"err": ".bench_sf1 missing — run bench.py once first"}))
        return 1

    corpora = {
        "sf1_50k_splittable": spark.read.parquet(
            os.path.join(sf1, "documents.parquet")
        ),
        "sf0.1_5k_one_rowgroup_fanned": fan_out_scan(
            load_table(spark, "/root/testdata/sf0.1", "documents")
        ),
    }

    out: dict = {"metric": "dedup_onepass_r12", "round": 12, "corpora": {}}
    for corpus_name, docs in corpora.items():
        cls = type(docs)
        real_ckpt = cls.localCheckpoint

        def no_lazy_ckpt(self, eager=True):
            if eager:
                return real_ckpt(self, eager=True)
            return self  # the r12 barriers are the only eager=False sites

        def build_minhash():
            sh = D.word_shingles(docs, "text", "doc_id", k=3)
            return D.lsh_candidates(
                D.minhash_signatures(sh, num_perm=64),
                num_perm=64,
                bands=16,
                max_bucket_size=16,
            )

        def build_simhash():
            return D.hamming_pairs(
                D.simhash(docs, "text", "doc_id"), max_dist=3, max_bucket_size=16
            )

        section: dict = {"n_docs": docs.count(), "pipelines": {}}
        for name, build in (
            ("minhash_lsh_capped", build_minhash),
            ("simhash_capped", build_simhash),
        ):
            build().count()  # warm plan+JVM
            row: dict = {}
            for side, patched in (("barrier", False), ("no_barrier", True)):
                if patched:
                    cls.localCheckpoint = no_lazy_ckpt
                try:
                    n, h = _result_hash(build())
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.time()
                        build().count()
                        best = min(best, time.time() - t0)
                    row[side] = {
                        "sec": round(best, 3),
                        "rows": n,
                        "md5": h,
                        "plan": _plan_counts(build()),
                    }
                finally:
                    cls.localCheckpoint = real_ckpt
                print(
                    f"{corpus_name}/{name}/{side}: {row[side]['sec']}s "
                    f"{row[side]['plan']}",
                    file=sys.stderr,
                )
            row["identical"] = row["barrier"]["md5"] == row["no_barrier"]["md5"]
            row["speedup_wall"] = round(
                row["no_barrier"]["sec"] / row["barrier"]["sec"], 3
            )
            section["pipelines"][name] = row
        out["corpora"][corpus_name] = section
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
