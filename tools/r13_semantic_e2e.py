"""r13 semantic e2e at 16M docs with stage breakdown (r12 verdict item #4).

SCALE_SPOT_r12 timed the 16M-doc COMPONENTS (train 17.6 s, capped pairs
44.9 s) but never composed them into one end-to-end q_dedup_semantic
row, and its verify-term finding — measured 3.59x per 3.2x N against
the O(n*E[size]) worst case's 6.25x — attributed the gap to "the
governor trims dense clusters" plus "partly n_pairs-bound" WITHOUT
quantifying either. This tool closes both:

1. ``semantic_e2e_16m_r13`` — the full pipeline at N=16M, every stage
   timed through the same parquet-spill materialization protocol as
   tools/r12_semantic_spot.py (comparable by construction): train
   (salted sample, k=2^15, spread init, 3 Lloyd iters) -> assign+index
   (routed Arrow argmin + unit-normalize + size-cap; the
   semantic_dedup_ingest empty-index face, exactly q_dedup_semantic's
   assign) -> pairs (the applyInPandas within-cluster kernel, governor
   on; per-pair VERIFY is the kernel's own exact dot product — SemDeDup
   has no separate verify pass, the candidate comparison IS exact).

2. ``gap_attribution_r13`` — which term the pair stage's wall actually
   tracks. The r12 cluster stats already show the SIZE governor trimmed
   NOTHING at these operating points (cluster_max 1058 < cap 2000 at
   5M; 2774 < 3904 at 16M — zero clusters dropped), so the 3.59-vs-6.25
   gap cannot be size-cap trimming. The candidates left: (a) the
   matmul-flop term is NOT n*E[avg size] but sum(c_i^2), which grows
   slower when the size DISTRIBUTION flattens (k frozen at 2^15 spreads
   the new mass); (b) the PAIR-STREAM governor (max_pairs=4*cap) trims
   emission inside clique-heavy clusters; (c) per-emitted-pair
   materialization cost (n_pairs-boundedness). Protocol: capped vs
   uncapped pair runs at BOTH 5M and 16M + the exact sum(c_i^2) at
   both. The within-N capped/uncapped delta was MEANT to price the
   per-pair term beta = d(wall)/d(n_pairs) with flops held EXACTLY
   constant (the kernel computes the full S matrix either way;
   _bucket_pairs_fn caps after thresholding) — but the 5M A/B proved
   session-unstable (capped/uncapped 25.9/25.5 s in one session,
   13.6/81.2 s in another, same data same code — ~100M-row Arrow
   emission is GC-regime-sensitive), so the recorded conclusion rests
   on the CROSS-N structural ratios instead, which are exact counts:
   sum_c2 (flop volume) grew 6.33x while the capped wall grew 2.81x,
   tracking the 3.52x emitted-pair volume — the stage is emission-
   bound, not matmul-bound, and the size cap dropped ZERO docs at both
   points (the beta section of the output is kept but must be read
   with the instability caveat).

Reuses ensure_corpora from tools/r12_semantic_spot.py (same 320-replica
.bench_semcap corpus; decade filters give 5M/10M/16M).

Usage: python tools/r13_semantic_e2e.py
(one JSON doc on stdout; stage markers + per-point rows stream to
stderr). ~12-20 min on an idle 32-cpu host. SEMCAP_POINTS=sf16m reruns
one point (the cross-N attribution section then needs both; a
single-point run still prints its rows).

Heap note, CORRECTED by the r14 probes (tools/r14_heap_cliff.py,
SCALE_SPOT_r14 heap_cliff_r14) and CLOSED by the r15 refactor: the r13
claim here that 8g/20g heaps OOM the 16M assign/index exchange did not
reproduce under PROCESS isolation — the full governed 16M pipeline
runs at the default 8g in its own JVM. The crashes were shared-JVM
residue: local-mode spark.stop() leaves the gateway JVM alive, so the
old per-point _fresh_session never actually isolated the points (one
JVM served them all, heap setting and leftover state included). Since
r15 this tool enforces the recorded one-JVM-per-corpus-point rule
structurally: the parent process starts NO JVM; the corpus build and
each corpus point run as their own subprocess (--build / --point
<label>), so the default 8g heap suffices and the phantom cliff cannot
be re-manufactured here. An OOM in a point child is now evidence about
the pipeline, not the harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from r12_semantic_spot import ensure_corpora  # noqa: E402


def _fresh_session(name: str):
    """One Spark session PER corpus point (first run's lesson, stderr in
    /tmp/sem_e2e_progress.log of 2026-08-16): the 5M point's ingest-face
    localCheckpoint blocks stay heap-pinned until ContextCleaner GC, and
    the 16M embed write then OOMs the shared 8g driver heap — a harness
    artifact, not a pipeline property. Per-point sessions make every
    point's heap state identical (and match how the registered query
    actually runs: one model per session)."""
    from kafka_map_reduce_spark import get_session

    return get_session(
        name,
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )


def _corpora_dirs() -> dict:
    """The .bench_semcap point paths IF the build marker exists —
    session-free, so point children never start a JVM just to resolve
    paths. Delegates to r12_semantic_spot.semcap_dirs: ONE definition
    of the marker + point keys shared with ensure_corpora, so a layout
    change there cannot strand this tool's children."""
    from r12_semantic_spot import semcap_dirs

    return semcap_dirs(os.path.join(REPO, ".bench_semcap"))


def run_point(label: str) -> dict:
    """One corpus point in THIS process's one and only JVM (the
    one-JVM-per-corpus-point rule, SCALE_SPOT_r14 heap_cliff_r14). No
    spark.stop() at the end: process exit IS the isolation — in local
    mode stop() would leave the gateway JVM alive anyway."""
    from pyspark.sql import functions as F

    from kafka_map_reduce_spark.operators import similarity as S
    from kafka_map_reduce_spark.operators.text import attach_hash_embed_arrow

    d = _corpora_dirs()[label]
    tmp = os.path.join(REPO, ".bench_semcap", "tmp")
    spark = _fresh_session(f"r13-semantic-e2e-{label}")
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    print(json.dumps({"stage": "embed_start", "label": label, "t": round(time.time(), 1)}), file=sys.stderr)
    emb_path = os.path.join(tmp, f"emb_{label}")
    t0 = time.time()
    (
        attach_hash_embed_arrow(docs, "text", "embedding", dim=32)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .write.mode("overwrite")
        .parquet(emb_path)
    )
    embed_sec = round(time.time() - t0, 1)
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    k, mod, cap = S.semantic_model_params(n)

    # ---- stage 1: train (frozen-sample Lloyd at the k cap) --------
    print(json.dumps({"stage": "train_start", "label": label, "t": round(time.time(), 1)}), file=sys.stderr)
    train = S._hash_mod_filter(emb, "vec_id", mod)
    t0 = time.time()
    cents = S.kmeans_fit(
        train, k, iters=3, vec_col="embedding", id_col="vec_id",
        init="spread",
    ).localCheckpoint(eager=True)
    train_sec = round(time.time() - t0, 1)
    k_eff = cents.count()

    # ---- stage 2: assign + normalize + size-cap (the index face) --
    print(json.dumps({"stage": "assign_start", "label": label, "t": round(time.time(), 1)}), file=sys.stderr)
    empty = spark.createDataFrame([], "id long, bkt int, __vn array<double>")
    idx_path = os.path.join(tmp, f"index_{label}")
    t0 = time.time()
    _, index = S.semantic_dedup_ingest(
        emb, cents, empty, threshold=0.85, max_cluster_size=cap
    )
    index.write.mode("overwrite").parquet(idx_path)
    assign_sec = round(time.time() - t0, 1)
    index = spark.read.parquet(idx_path)
    n_indexed = index.count()

    sizes = index.groupBy("bkt").count()
    stats = sizes.agg(
        F.avg("count").alias("avg"),
        F.max("count").alias("max"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("count") * F.col("count")).alias("sum_c2"),
    ).collect()[0]

    # ---- stage 3: pairs (exact in-kernel verify), governor A/B ----
    def timed_pairs(max_pairs):
        acc = spark.sparkContext.accumulator(0)
        kernel = S._bucket_pairs_fn(0.85, max_pairs=max_pairs)

        def counted(pdf):
            out = kernel(pdf)
            acc.add(len(out))
            return out

        t0 = time.time()
        raw = index.groupBy("bkt").applyInPandas(
            counted, "id_a long, id_b long, sim double"
        )
        # parquet spill BEFORE the orderBy, r12 protocol: the sort's
        # range-sampling job would re-execute the kernel (double
        # count), and heap checkpoints OOM at 16M-doc pair volumes.
        raw_path = os.path.join(tmp, "pairs_raw")
        raw.write.mode("overwrite").parquet(raw_path)
        raw = spark.read.parquet(raw_path)
        raw.select(
            "id_a",
            "id_b",
            (F.floor(F.col("sim") * 10000 + F.lit(0.5)) / F.lit(10000)).alias("sim"),
        ).orderBy("id_a", "id_b").write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 1), acc.value

    print(json.dumps({"stage": "pairs_start", "label": label, "t": round(time.time(), 1)}), file=sys.stderr)
    pairs_cap_sec, n_cap = timed_pairs(4 * cap)
    # Uncapped A/B at sf5m ONLY (the r12 protocol): the 16M uncapped
    # emission stream crash-looped the Python workers on this host
    # (first r13 attempt, /tmp/sem_e2e_16m.log 2026-08-16 — 48g JVM
    # + 32 Arrow workers + a ~2x-capped pair stream exceeds host
    # RAM; the same blowup class the r12 tiled-argmin fix removed
    # from the assign stage). The 5M A/B prices the per-emitted-pair
    # term with flops held constant; the governor is exactly what
    # makes the 16M point runnable — which is itself the finding.
    if label == "sf5m":
        pairs_unc_sec, n_unc = timed_pairs(None)
    else:
        pairs_unc_sec, n_unc = None, None

    row = {
        "n_docs": n,
        "k_requested": k,
        "k_effective": k_eff,
        "train_sample_mod": mod,
        "max_cluster_size": cap,
        "n_docs_surviving_size_cap": n_indexed,
        "docs_dropped_by_size_cap": n - n_indexed,
        "cluster_avg": round(float(stats["avg"]), 1),
        "cluster_max": int(stats["max"]),
        "n_clusters": int(stats["n_clusters"]),
        "sum_c2": int(stats["sum_c2"]),
        "embed_sec": embed_sec,
        "train_sec": train_sec,
        "assign_index_sec": assign_sec,
        "pairs_capped_sec": pairs_cap_sec,
        "n_pairs_capped": n_cap,
        "pairs_uncapped_sec": pairs_unc_sec,
        "n_pairs_uncapped": n_unc,
        "e2e_sec_governed": round(train_sec + assign_sec + pairs_cap_sec, 1),
    }
    print(json.dumps({"progress": label, **row}), file=sys.stderr)
    return row


def _run_child(args: list[str]) -> dict:
    """Spawn this script in a fresh process (its own JVM) and return the
    last JSON line of its stdout; stderr (stage markers, per-point
    progress) streams through to the parent's stderr."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE,
        text=True,
    )
    docs = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                docs.append(json.loads(line))
            except ValueError:
                pass
    last = docs[-1] if docs else None
    # On a failing rc, a declared {"err": ...} doc wins even when a
    # later JSON-looking line (a stray library print) lands after it —
    # keying on the LAST line only would mask the real error into the
    # generic RuntimeError below (ADVICE r15).
    if proc.returncode != 0:
        for d in docs:
            if "err" in d:
                return d
    # A child that DECLARED its failure (an {"err": ...} doc + rc 1)
    # is a contract-conformant outcome the caller handles — only a
    # child that died without saying why raises here.
    if last is None or (proc.returncode != 0 and "err" not in last):
        raise RuntimeError(
            f"child {args} failed rc={proc.returncode}; "
            f"stdout tail: {proc.stdout[-500:]!r}"
        )
    return last


def main() -> int:
    argv = sys.argv[1:]

    # ---- child: corpus build, one JVM, exits when done ----------------
    if "--build" in argv:
        sf1 = os.path.join(REPO, ".bench_sf1")
        if not os.path.exists(os.path.join(sf1, "documents.parquet")):
            print(json.dumps({"err": ".bench_sf1 missing — run bench.py once first"}))
            return 1
        spark = _fresh_session("r13-semantic-e2e-build")
        t0 = time.time()
        ensure_corpora(spark, sf1, os.path.join(REPO, ".bench_semcap"))
        print(json.dumps({"built": True, "corpus_build_sec": round(time.time() - t0, 1)}))
        return 0

    # ---- child: one corpus point, one JVM, exits when done ------------
    if "--point" in argv:
        label = argv[argv.index("--point") + 1]
        if not _corpora_dirs():
            print(json.dumps({"err": "corpus missing — the parent runs --build first"}))
            return 1
        row = run_point(label)
        print(json.dumps({"point_label": label, "point_row": row}))
        return 0

    # ---- parent: JVM-free orchestrator (one JVM per corpus point) -----
    # Skip the build child entirely when the marker already exists —
    # ensure_corpora's fast path would only confirm it after paying a
    # full Spark session start.
    if _corpora_dirs():
        build = {"built": False, "corpus_build_sec": 0.0}
    else:
        build = _run_child(["--build"])
        if "err" in build:
            print(json.dumps(build))
            return 1
    result: dict = {
        "metric": "r13_semantic_e2e",
        "round": 13,
        "isolation": "one JVM per corpus point (r15; SCALE_SPOT_r14 heap_cliff_r14)",
        "corpus_build_sec": build["corpus_build_sec"],
    }
    rows: dict = {}
    points = tuple(os.environ.get("SEMCAP_POINTS", "sf5m,sf16m").split(","))
    for label in points:
        out = _run_child(["--point", label])
        # Mirror the build path (ADVICE r15): a point child that exits
        # with a declared {"err": ...} doc passes _run_child's contract
        # check by design — surface that doc instead of crashing on an
        # opaque KeyError at out["point_label"].
        if "err" in out:
            print(json.dumps({**out, "point": label}))
            return 1
        rows[out["point_label"]] = out["point_row"]

    # Per-pair emission price from the within-N A/B (flops identical on
    # both sides of each A/B by construction); flop price from the
    # residual of the capped wall.
    attribution: dict = {}
    for label, r in rows.items():
        if r["n_pairs_uncapped"] is None:
            continue
        dp = r["n_pairs_uncapped"] - r["n_pairs_capped"]
        dw = r["pairs_uncapped_sec"] - r["pairs_capped_sec"]
        beta = dw / dp if dp > 0 else None  # sec per emitted pair
        pair_term = beta * r["n_pairs_capped"] if beta is not None else None
        flop_term = (
            r["pairs_capped_sec"] - pair_term if pair_term is not None else None
        )
        attribution[label] = {
            "beta_sec_per_emitted_pair": beta,
            "capped_wall_pair_term_sec": (
                round(pair_term, 1) if pair_term is not None else None
            ),
            "capped_wall_flop_plus_fixed_term_sec": (
                round(flop_term, 1) if flop_term is not None else None
            ),
        }
    result["semantic_e2e_16m_r13"] = rows
    # The cross-N ratio section needs BOTH points; a documented
    # single-point rerun (SEMCAP_POINTS=sf16m) must still print its
    # per-point rows instead of dying on a KeyError after ~20 min
    # of work (ADVICE r13).
    if "sf5m" in rows and "sf16m" in rows:
        r5, r16 = rows["sf5m"], rows["sf16m"]
        result["gap_attribution_r13"] = {
            **attribution,
            "ratio_16m_over_5m": {
                "n_docs": round(r16["n_docs"] / r5["n_docs"], 2),
                "cluster_avg_model_n_times_size": round(
                    (r16["n_docs"] / r5["n_docs"]) * (r16["cluster_avg"] / r5["cluster_avg"]), 2
                ),
                "sum_c2_exact_flops": round(r16["sum_c2"] / r5["sum_c2"], 2),
                "n_pairs_capped": round(r16["n_pairs_capped"] / r5["n_pairs_capped"], 2),
                "pairs_capped_wall": round(
                    r16["pairs_capped_sec"] / r5["pairs_capped_sec"], 2
                ),
                "e2e_governed_wall": round(
                    r16["e2e_sec_governed"] / r5["e2e_sec_governed"], 2
                ),
            },
            "size_cap_dropped_docs": {
                "sf5m": r5["docs_dropped_by_size_cap"],
                "sf16m": r16["docs_dropped_by_size_cap"],
            },
        }
    else:
        result["gap_attribution_r13"] = attribution or {
            "note": "single-point run; cross-N ratios need sf5m AND sf16m"
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
