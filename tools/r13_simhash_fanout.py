"""r13 idle-host re-A/B: fan_out_scan under q_dedup_simhash_capped
(r12 verdict item #5).

History: the r11 fan-out sweep measured SimHash LOSING from the scan
repartition (1.674 -> 1.875 s, SCALE_SPOT_r11 fanout_r11) and rejected
it — but that measurement ran on the post-reboot degraded host (~20
effective of 32 nominal cores), exactly the regime where an added
exchange can't pay for itself. The r12 watch-item profile then showed
q_dedup_simhash_capped runs at avg 1.9 cores with 1.84 s of its 3.37 s
wall in single-task JVM signature work — the shape fan-out exists to
fix. Contract from the brief: re-measure min-of-3 on an idle host;
adopt only on a >= 1.25x win with bit-identical output, else record
the negative with the numbers.

A-side: HEAD q_dedup_simhash_capped (and the uncapped variant, same
signature stage) at $SPARK_GRAFT_SF_DIR.
B-side: same query with the documents scan routed through fan_out_scan
before simhash — rebuilt here from the same operators rather than
monkeypatching load_table (the B plan is exactly what adoption would
ship; signatures are per-row deterministic xxhash64, so output is
provably partition-invariant, and we verify the hash anyway).

Usage: python tools/r13_simhash_fanout.py  (one JSON doc on stdout)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_RUNS = 3


def result_hash(df) -> tuple[int, str]:
    rows = sorted(map(str, df.collect()))
    return len(rows), hashlib.md5(str(rows).encode()).hexdigest()


def main() -> int:
    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import dedup as D
    from kafka_map_reduce_spark.sources.tables import fan_out_scan, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        "r13-simhash-fanout",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32")),
    )

    def build(fanned: bool, capped: bool):
        docs = load_table(spark, sf_dir, "documents")
        if fanned:
            docs = fan_out_scan(docs)
        sim = D.simhash(docs, "text", "doc_id")
        kw = {"max_bucket_size": 16} if capped else {}
        return D.hamming_pairs(sim, max_dist=3, **kw).orderBy("id_a", "id_b")

    def timed(df_fn) -> float:
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            df_fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # interleave A/B reps? No — min-of-3 per side, sides back-to-back,
    # plus a HEAD re-run at the end as the same-session drift witness.
    out: dict = {"metric": "r13_simhash_fanout", "round": 13, "sf_dir": sf_dir}
    for variant in ("capped", "uncapped"):
        capped = variant == "capped"
        a = timed(lambda: build(False, capped))
        b = timed(lambda: build(True, capped))
        a2 = timed(lambda: build(False, capped))
        na, ha = result_hash(build(False, capped))
        nb, hb = result_hash(build(True, capped))
        out[variant] = {
            "head_sec": a,
            "fanout_sec": b,
            "head_rerun_sec": a2,
            "speedup_head_over_fanout": round(a / b, 3) if b else None,
            "rows": na,
            "output_identical": (na, ha) == (nb, hb),
        }
        print(json.dumps({"progress": variant, **out[variant]}), file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
