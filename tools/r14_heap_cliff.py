"""r14 driver-heap sizing probe for the 16M-doc semantic assign+index
stage (r13 verdict item #6).

r13 observed an operational cliff: the 16M assign+index write OOM'd at
8 GiB and 20 GiB driver heap (BufferedRowIterator append) and ran at
48 GiB. This tool brackets the cliff and tests whether
spark.sql.shuffle.partitions moves it, so the sizing rule recorded
next to the operator is measured, not anecdotal.

Parent mode (no argv): runs each (heap, shuffle_partitions) config as
an ISOLATED subprocess (a driver OOM kills the JVM and the Python
gateway with it — isolation keeps one crash from ending the sweep) and
prints one JSON doc with per-config status + stage walls.

Child mode (argv: child <heap> <shuffle>): reproduces the r13 16M
stage exactly — read emb_sf16m, train (salted sample, k=2^15, spread,
3 Lloyd iters), semantic_dedup_ingest empty face, fat index parquet
write — emitting stage markers on stderr so the parent can tell WHICH
stage died.

Note on what "driver heap" means here: local[32] runs executors inside
the driver JVM, so the knob sizes the WHOLE execution heap — on a real
cluster this pressure lands on executor memory and the driver needs
only the collected centroid model (k x dim doubles, ~8 MB at k=2^15).
The cliff is a local-mode harness property; the recorded rule exists
so the next 16M+ local run doesn't rediscover it by crashing twice.

Usage: python tools/r14_heap_cliff.py          (runs the sweep)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CONFIGS = [
    ("20g", 64, False),   # r13's crash point, same shuffle, isolated stage
    ("20g", 256, False),  # do smaller shuffle/scan partitions move it?
    ("32g", 64, False),   # bracket between 20g and the working 48g
    # The first sweep pass: all three ISOLATED configs PASSED (20g/64
    # assign+index 21.3 s) — the r13 OOM did not reproduce when the
    # child reads pre-materialized embeddings. r13's crashed attempts
    # ran the 16M EMBED stage in the same session first; this config
    # replicates that exact session shape (documents -> hash-embed ->
    # write -> read -> train -> assign) to test whether the cliff is
    # session-cumulative rather than stage-intrinsic.
    ("20g", 64, True),
    ("8g", 64, True),     # r13's other crash point, same session shape
    # Second pass: BOTH with-embed configs passed too (8g: embed+train
    # 19.4+assign 21.7 s, no OOM) — the r13 crashes were the
    # shared-multi-point-session artifact (5M ingest checkpoint blocks
    # still heap-pinned when the 16M point ran), not a stage property.
    # Final config: the ENTIRE governed 16M pipeline (embed -> train ->
    # assign+index -> governed pairs) in ONE 8g per-point session — if
    # this passes, the recorded sizing rule is about session shape, not
    # gigabytes.
    ("8g", 64, "full"),
]


def child(heap: str, shuffle: int, with_embed: bool = False) -> int:
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark import get_session
    from kafka_map_reduce_spark.operators import similarity as S

    tmp = os.path.join(REPO, ".bench_semcap", "tmp")
    spark = get_session(
        f"r14-heap-{heap}-{shuffle}",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=shuffle,
    )
    emb_path = os.path.join(tmp, "emb_sf16m")
    if with_embed:
        # replicate the r13 e2e per-point session shape: the embed
        # stage runs IN THIS SESSION and its write lands in a scratch
        # path (the shared emb parquet stays untouched for other tools)
        from kafka_map_reduce_spark.operators.text import (
            attach_hash_embed_arrow,
        )

        docs = spark.read.parquet(
            os.path.join(REPO, ".bench_semcap", "sf16m", "documents.parquet")
        )
        emb_path = os.path.join(tmp, "emb_heapprobe")
        print(json.dumps({"stage": "embed_start"}), file=sys.stderr, flush=True)
        t0 = time.time()
        (
            attach_hash_embed_arrow(docs, "text", "embedding", dim=32)
            .select(F.col("doc_id").alias("vec_id"), "embedding")
            .write.mode("overwrite")
            .parquet(emb_path)
        )
        print(
            json.dumps({"stage": "embed_done",
                        "embed_sec": round(time.time() - t0, 1)}),
            file=sys.stderr, flush=True,
        )
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    k, mod, cap = S.semantic_model_params(n)
    print(json.dumps({"stage": "train_start"}), file=sys.stderr, flush=True)
    t0 = time.time()
    cents = S.kmeans_fit(
        S._hash_mod_filter(emb, "vec_id", mod),
        k, iters=3, vec_col="embedding", id_col="vec_id", init="spread",
    ).localCheckpoint(eager=True)
    cents.count()
    train_sec = round(time.time() - t0, 1)
    print(
        json.dumps({"stage": "assign_start", "train_sec": train_sec}),
        file=sys.stderr, flush=True,
    )
    empty = spark.createDataFrame([], "id long, bkt int, __vn array<double>")
    t0 = time.time()
    _, index = S.semantic_dedup_ingest(
        emb, cents, empty, threshold=0.85, max_cluster_size=cap
    )
    index.write.mode("overwrite").parquet(
        os.path.join(tmp, f"index_heapprobe")
    )
    assign_sec = round(time.time() - t0, 1)
    print(
        json.dumps({"stage": "assign_done", "assign_index_sec": assign_sec}),
        file=sys.stderr, flush=True,
    )
    if with_embed == "full":
        # governed pairs, the r13 spill protocol (parquet before sort).
        # PROTOCOL NOTE: this block and tools/r14_assign_decomp.py
        # run_pairs are frozen replicas of tools/r13_semantic_e2e.py
        # timed_pairs (the canonical copy, which additionally counts
        # kernel emissions via an accumulator) — frozen so each round's
        # recorded numbers stay protocol-identical to the artifact they
        # are compared against; a protocol change must start from the
        # r13 copy and bump all three deliberately.
        index = spark.read.parquet(os.path.join(tmp, "index_heapprobe"))
        kernel = S._bucket_pairs_fn(0.85, max_pairs=4 * cap)
        raw_path = os.path.join(tmp, "pairs_heapprobe")
        t0 = time.time()
        index.groupBy("bkt").applyInPandas(
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
        print(
            json.dumps({"stage": "pairs_done",
                        "pairs_sec": round(time.time() - t0, 1)}),
            file=sys.stderr, flush=True,
        )
    print(json.dumps({"stage": "done"}), file=sys.stderr, flush=True)
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        mode = sys.argv[4] if len(sys.argv) > 4 else ""
        return child(
            sys.argv[2], int(sys.argv[3]),
            with_embed=("full" if mode == "full" else mode == "embed"),
        )

    only = os.environ.get("HEAP_CLIFF_ONLY")  # e.g. "20g:64:embed"
    out: dict = {"metric": "r14_heap_cliff", "round": 14, "configs": []}
    for heap, shuffle, with_embed in CONFIGS:
        mode = (
            "full" if with_embed == "full"
            else "embed" if with_embed else "noembed"
        )
        tag = f"{heap}:{shuffle}:{mode}"
        if only and tag != only:
            continue
        env = dict(os.environ)
        env["SPARK_GRAFT_DRIVER_MEM"] = heap
        t0 = time.time()
        argv = [
            sys.executable, os.path.abspath(__file__), "child", heap,
            str(shuffle),
        ] + ([mode] if mode != "noembed" else [])
        timed_out = False
        try:
            proc = subprocess.run(
                argv, env=env, capture_output=True, text=True, timeout=1800,
            )
            returncode, stderr = proc.returncode, proc.stderr
            stdout = proc.stdout or ""
        except subprocess.TimeoutExpired as e:
            # a child GC-thrashing at the cliff instead of exiting must
            # not abort the sweep and lose the completed configs
            timed_out = True

            def _s(v):
                return (
                    v.decode("utf-8", "replace") if isinstance(v, bytes)
                    else (v or "")
                )

            returncode, stderr, stdout = None, _s(e.stderr), _s(e.stdout)
        wall = round(time.time() - t0, 1)
        stderr_lines = [ln for ln in stderr.splitlines() if ln.strip()]
        stdout_lines = [ln for ln in stdout.splitlines() if ln.strip()]
        stages = [ln for ln in stderr_lines if ln.startswith('{"stage"')]
        # Scan BOTH channels (ADVICE r14 #3): JVM hs_err notices and py4j
        # tracebacks frequently land on stdout, so a stderr-only grep can
        # record a real OOM as oom_seen=false with only a bare nonzero
        # exit, weakening the sweep's stage attribution.
        oom = any(
            "OutOfMemoryError" in ln or "java heap space" in ln.lower()
            for ln in stderr_lines + stdout_lines
        )
        row = {
            "heap": heap,
            "shuffle_partitions": shuffle,
            "embed_in_session": with_embed,
            "exit_code": returncode,
            "ok": returncode == 0,
            "timed_out": timed_out,
            "oom_seen": oom,
            # a kernel OOM-killer SIGKILL leaves NO OutOfMemoryError on
            # stderr — the host-RAM failure mode this probe brackets;
            # classify it instead of hiding it behind a bare -9
            "killed_by_signal": (
                -returncode if returncode is not None and returncode < 0
                else None
            ),
            "wall_sec": wall,
            "stage_markers": stages[-3:],
            "stderr_tail": stderr_lines[-3:] if returncode != 0 else [],
            "stdout_tail": stdout_lines[-3:] if returncode != 0 else [],
        }
        out["configs"].append(row)
        print(json.dumps({"progress": row}), file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
