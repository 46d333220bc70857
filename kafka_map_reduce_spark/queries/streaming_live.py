"""Live Structured-Streaming queries (Tier A): watermark, stateful
reducer, DLQ split, JSONEachRow sink — executed as real streams
(file-replay source, availableNow drain) whose results are read back as a
DataFrame for the driver.

These are the unbounded face of the reference pipeline: at-least-once
delivery via checkpoint-after-sink (§1.3), DLQ routing (lib.rs:526-540),
JSONEachRow batch sink (clickhouse.rs:86-88).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_map_reduce_spark.functions import round4
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.streaming import (
    JsonLinesSink,
    ParquetSink,
    Pipeline,
    file_replay_stream,
)
from kafka_map_reduce_spark.streaming.state import stateful_reduce


def _work_dir(sf_dir: str, name: str) -> str:
    """Fresh scratch dir per (query, sf, process) run — pid-scoped so a
    concurrent harness/parity process can't rmtree a checkpoint or source
    directory this one's stream is actively reading."""
    base = os.path.join(
        tempfile.gettempdir(), "kmr_stream", f"pid{os.getpid()}", name,
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return base


def _drain(query, timeout: float = 300.0) -> None:
    """Await an availableNow stream with a hard deadline: errors AND
    wedges surface (per-query) instead of hanging the whole harness run
    or silently returning partial output."""
    from kafka_map_reduce_spark.streaming.pipeline import drain_query

    drain_query(query, timeout)


@query("q_stream_watermark", oracle=None, tags=("streaming",))
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed count with a 10-minute watermark over a multi-batch file
    replay — late-data bound + state eviction (append mode: a window only
    emits once its end passes the watermark)."""
    wd = _work_dir(sf_dir, "watermark")
    # Split events into 2 roughly ts-ordered files so the watermark
    # actually advances across micro-batches.
    from kafka_map_reduce_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    src = os.path.join(wd, "src")
    ev.repartitionByRange(2, "ts").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    # Watermarks require TIMESTAMP (not NTZ); session tz is pinned to UTC
    # by configure() so the cast is wall-clock-stable.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
        .coalesce(2)  # hourly windows at test SF: keep the writer fan-out tiny
    )
    out = os.path.join(wd, "out")
    _drain(
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(wd, "ckpt"))
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .start(out)
    )
    return spark.read.parquet(out)


@query(
    "q_stream_stateful",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum
    FROM events GROUP BY user_id
    """,
    tags=("streaming",),
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key reducer lifecycle (reduce/flush, lib.rs:703-713) via
    applyInPandasWithState over a real stream; totals are exact-integer so
    the batch SQL oracle hash-matches the streaming result."""
    wd = _work_dir(sf_dir, "stateful")
    stream = file_replay_stream(spark, sf_dir, "events", wd, files_per_trigger=1000)

    def init():
        return (0, 0)

    def reduce_fn(acc, pdf: pd.DataFrame):
        import numpy as np

        cents = int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum())
        return (acc[0] + len(pdf), acc[1] + cents)

    def flush_fn(key, acc):
        return {"user_id": key[0], "n": acc[0], "cents_sum": acc[1]}

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("cents_sum", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
    )
    result = stateful_reduce(
        stream, ["user_id"], init, reduce_fn, flush_fn, state_schema, out_schema
    )
    out = os.path.join(wd, "out")
    _drain(
        # parquet rejects update mode; route through foreachBatch (append
        # per emitted update — single input batch => one row per key).
        # coalesce(1): ~150 keys land spread across every post-shuffle
        # partition; without it the write opens one parquet writer per
        # partition, which on a default-heap harness driver is the OOM path.
        result.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _id: df.coalesce(1).write.mode("append").parquet(out)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(wd, "ckpt"))
        .start()
    )
    return spark.read.parquet(out)


@query(
    "q_stream_dlq",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           floor((value * CAST(json_extract_string(props, '$.k') AS INTEGER))
                 * 10000 + 0.5) / 10000 AS weighted
    FROM events
    WHERE event_type <> 'error'
    """,
    tags=("streaming",),
)
def q_stream_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Tier A pipeline as a real stream: par_map parse (poison records
    of event_type='error' raise, mirroring the demo parse failure path) ->
    expression map -> parquet sink with 128-row file batches + parquet DLQ.
    The main-path output hash-matches the batch oracle; the DLQ holds
    exactly the poisoned records."""
    wd = _work_dir(sf_dir, "dlq")
    stream = file_replay_stream(spark, sf_dir, "events", wd)

    def parse(rec: dict) -> dict:
        import json

        if rec["event_type"] == "error":
            raise ValueError("poison record")
        return {"k": int(json.loads(rec["props"])["k"])}

    pipe = (
        Pipeline(stream)
        .par_map(parse, T.StructType([T.StructField("k", T.IntegerType())]))
        .map_expr(
            weighted=F.floor((F.col("value") * F.col("k")) * 10000 + F.lit(0.5))
            / F.lit(10000)
        )
    )
    main = ParquetSink(os.path.join(wd, "main"), max_batch_rows=128, coalesce=4)
    dlq = ParquetSink(os.path.join(wd, "dlq"), max_batch_rows=128, coalesce=2)
    pipe.run_stream(
        main, dlq=dlq, checkpoint_dir=os.path.join(wd, "ckpt")
    )
    return spark.read.parquet(main.path).select("event_id", "user_id", "k", "weighted")


@query(
    "q_sink_jsonl",
    oracle="""
    SELECT event_id, user_id, event_type,
           floor(value * 10000 + 0.5) / 10000 AS value
    FROM events
    """,
    tags=("streaming",),
)
def q_sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONEachRow sink round-trip (clickhouse.rs:86-88): stream events
    through the pipeline into newline-JSON files (128 rows per file), read
    back and hash-match the source."""
    wd = _work_dir(sf_dir, "jsonl")
    stream = file_replay_stream(spark, sf_dir, "events", wd).select(
        "event_id",
        "user_id",
        "event_type",
        (F.floor(F.col("value") * 10000 + F.lit(0.5)) / F.lit(10000)).alias("value"),
    )
    sink = JsonLinesSink(os.path.join(wd, "out"), max_batch_rows=128, coalesce=4)
    Pipeline(stream).run_stream(sink, checkpoint_dir=os.path.join(wd, "ckpt"))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(sink.path)


@query(
    "q_stream_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
           floor(e.value * 10000 + 0.5) / 10000 AS value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("streaming",),
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the unbounded events side streams while
    the customer dimension is broadcast to every task — the canonical
    lookup-join shape for a par_map-style enrichment stage (lib.rs:490-547
    does this per record over the network; here it is a stateless
    broadcast hash join, no watermark, no shuffle of the stream side)."""
    from kafka_map_reduce_spark.sources import load_table

    wd = _work_dir(sf_dir, "enrich")
    stream = file_replay_stream(spark, sf_dir, "events", wd)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    ).select(
        "event_id",
        "user_id",
        F.col("c_mktsegment").alias("segment"),
        round4(F.col("value")).alias("value"),
    )
    sink = ParquetSink(os.path.join(wd, "out"), coalesce=4)
    Pipeline(joined).run_stream(sink, checkpoint_dir=os.path.join(wd, "ckpt"))
    return spark.read.parquet(sink.path)


@query(
    "q_stream_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
           CAST(datediff('second', a.ts, b.ts) AS BIGINT) AS lag_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    tags=("streaming",),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within 10 minutes after a
    click by the same user. Both sides carry watermarks so the join state
    is bounded (rows outside the watermark+interval envelope are evicted);
    the time-range predicate is what makes unbounded x unbounded joinable
    at all. Inner matches emit as soon as both sides arrive, so the
    availableNow drain equals the batch join — hash-checked against the
    SQL oracle."""
    wd = _work_dir(sf_dir, "sjoin")
    s = file_replay_stream(spark, sf_dir, "events", wd).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    buys = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("buyer_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("buyer_id"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("lag_s"),
    )
    sink = ParquetSink(os.path.join(wd, "out"), coalesce=4)
    Pipeline(joined).run_stream(sink, checkpoint_dir=os.path.join(wd, "ckpt"))
    return spark.read.parquet(sink.path)


def ingest_micro_batch(
    batch_df: DataFrame,
    batch_id,
    corpus_path: str,
    index_path: str,
    pairs_path: str,
) -> None:
    """One foreachBatch ingest step of the streaming incremental-dedup
    composition (see q_stream_dedup_ingest). Module-level so the retry
    contract is directly testable: calling this twice with the same
    batch_id — the at-least-once redelivery case — must converge to the
    same table state with no disjointness wedge."""
    from kafka_map_reduce_spark.operators import dedup as D

    s = batch_df.sparkSession
    # Exclude THIS batch's own partition from both reads: a retried
    # micro-batch (foreachBatch is at-least-once) may have already
    # written batch=<id>/ before the failure, and re-reading it would
    # (a) present overlapping id spaces to incremental_near_dedup's
    # disjointness guard — wedging the stream permanently — and
    # (b) let the retry classify the batch's docs as dups of
    # themselves. The same filter makes the mid-ingest appends safe:
    # if executor cache eviction forces a lineage recompute AFTER the
    # index append below, the re-read still sees exactly the
    # pre-batch state. The discovered `batch` partition column is
    # bookkeeping, not data, so it is pruned then dropped.
    this_batch = str(batch_id)
    corpus = (
        s.read.parquet(corpus_path)
        .filter(F.col("batch") != this_batch)
        .drop("batch")
    )
    index = (
        s.read.parquet(index_path)
        .filter(F.col("batch") != this_batch)
        .drop("batch")
    )
    cached: list = []
    pairs, novel_ids, banded = D.incremental_near_dedup(
        batch_df, corpus, index, "text", "doc_id", min_jaccard=0.5,
        cache_registry=cached,
    )
    # Materialize the novel/dup verdict ONCE before any append:
    # localCheckpoint truncates lineage, so the index/corpus writes
    # below can never trigger a recompute that re-reads the paths
    # they just modified — persist() alone is best-effort under
    # cache eviction, a checkpoint is deterministic.
    novel_ids = novel_ids.localCheckpoint(eager=True)
    # idempotent commits: overwrite THIS batch's partition only
    pairs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(pairs_path, f"batch={batch_id}")
    )
    keep = banded.join(novel_ids, "id", "left_semi")
    keep.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_path, f"batch={batch_id}")
    )
    batch_df.join(
        novel_ids.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(corpus_path, f"batch={batch_id}")
    )
    # release the batch-sized caches: over thousands of micro-batches
    # the leak would crowd out genuinely hot executor memory
    for c in cached:
        c.unpersist()


@query("q_stream_dedup_ingest", oracle=None, tags=("streaming", "approx"))
def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental corpus ingest — the Tier A x Tier C
    composition a continuously-built training corpus runs in production:
    each micro-batch probes the persisted LSH band index for near-dups of
    everything ingested before it (operators/dedup.py:
    incremental_near_dedup), then appends its NOVEL docs' banded rows to
    the index and their text to the corpus table. Index growth tracks the
    kept ingest rate; a batch never re-scans the corpus.

    foreachBatch gives at-least-once batch delivery, and the three
    outputs cannot be committed atomically — so every output is written
    as an OVERWRITE of a batch_id-keyed partition directory
    (``batch=<id>/``): a retried micro-batch rewrites exactly its own
    partitions and duplicates nothing (effectively-once tables without a
    transactional format), and every read inside ``ingest`` filters OUT
    the current batch's partition so a retry observes exactly the
    pre-batch corpus/index state rather than its failed attempt's
    half-committed output. Duplicate corpus rows would be silently
    corrupting — word_shingles assumes unique ids — so idempotence here
    is load-bearing, not cosmetic.

    The replay plants both pair kinds: micro-batch 1 carries near-dups of
    the initial corpus (+200000), micro-batch 2 carries near-dups of
    batch 1's NOVEL docs (+300000) — detectable only if the index append
    between batches actually works. Rows-only (minhash seed-dependence);
    the planted-pair contract is pytest-enforced."""
    import time

    from kafka_map_reduce_spark.operators import dedup as D
    from kafka_map_reduce_spark.sources import load_table

    wd = _work_dir(sf_dir, "dedup_ingest")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus0 = docs.filter(F.col("doc_id") < 400)

    corpus_path = os.path.join(wd, "corpus")
    index_path = os.path.join(wd, "index")
    pairs_path = os.path.join(wd, "pairs")
    # every writer (bootstrap included) targets a batch=<id>/ partition
    # dir so partition discovery sees one consistent layout and a retried
    # micro-batch overwrites only its own output
    corpus0.write.mode("overwrite").parquet(
        os.path.join(corpus_path, "batch=init")
    )
    D.lsh_banded(
        D.minhash_signatures(D.word_shingles(corpus0, "text", "doc_id"))
    ).write.mode("overwrite").parquet(os.path.join(index_path, "batch=init"))

    # two replay files = two micro-batches (maxFilesPerTrigger=1), age-
    # ordered so batch 1 (dups of corpus) precedes batch 2 (dups of
    # batch 1's novels)
    src = os.path.join(wd, "src")
    os.makedirs(src, exist_ok=True)
    b1 = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        corpus0.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" ingest tail")).alias("text"),
        )
    )
    b2 = docs.filter((F.col("doc_id") >= 450)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        docs.filter(
            (F.col("doc_id") >= 400) & (F.col("doc_id") < 450) & (F.col("doc_id") % 10 == 0)
        ).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" second tail")).alias("text"),
        )
    )
    for i, b in enumerate((b1, b2)):
        tmp = os.path.join(wd, f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))

    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def ingest(batch_df, batch_id):
        ingest_micro_batch(
            batch_df, batch_id, corpus_path, index_path, pairs_path
        )

    _drain(
        stream.writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(wd, "ckpt"))
        .start()
    )
    return spark.read.parquet(pairs_path).drop("batch").orderBy("id_a", "id_b")


@query("q_stream_gated_ingest", oracle=None, tags=("streaming",))
def q_stream_gated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gated live ingest (streaming/gated.py): a frozen
    classifier — trained ONCE here on a labeled seed, then immutable —
    scores every micro-batch and routes accepts/rejects to batch-keyed
    overwrite partitions. The production composition where the model
    trains rarely and the gate runs on every arriving batch forever;
    retry-safe with NO read-own-write hazard (the gate reads no prior
    state — contrast q_stream_dedup_ingest).

    The replay plants separable traffic: micro-batch rows are either
    real fixture prose (accept) or digit-noise junk built from the same
    rows (reject, id+500000). Rows-only (iterative training); routing
    parity, conservation and redelivery idempotence are pytest-pinned
    in tests/test_gated_ingest.py. Output = (doc_id, batch, decision)
    for every routed row."""
    import time

    from kafka_map_reduce_spark.operators.classifier import (
        logreg_fit,
        quality_features,
    )
    from kafka_map_reduce_spark.sources import load_table
    from kafka_map_reduce_spark.streaming.gated import gated_ingest_stream

    wd = _work_dir(sf_dir, "gated_ingest")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # seed model: fixture prose vs digit-noise junk (deterministic fit)
    junk = docs.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(
            F.lit("00 11## 22@@ 33 "),
            F.regexp_replace(F.col("text"), r"[A-Za-z]", "9"),
        ).alias("text"),
    )
    seed = (
        docs.filter(F.col("doc_id") < 100)
        .withColumn("y", F.lit(1))
        .unionByName(junk.withColumn("y", F.lit(0)))
        .withColumn("x", quality_features(F.col("text")))
    )
    weights = logreg_fit(seed, "x", "y", dim=8, iters=15, lr=2.0)

    # two micro-batches of mixed traffic, age-ordered files
    src = os.path.join(wd, "src")
    os.makedirs(src, exist_ok=True)
    mk_junk = lambda d: d.select(  # noqa: E731
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(
            F.lit("00 11## 22@@ 33 "),
            F.regexp_replace(F.col("text"), r"[A-Za-z]", "9"),
        ).alias("text"),
    )
    b1_base = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    b2_base = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
    for i, b in enumerate(
        (
            b1_base.unionByName(mk_junk(b1_base.filter(F.col("doc_id") % 3 == 0))),
            b2_base.unionByName(mk_junk(b2_base.filter(F.col("doc_id") % 4 == 0))),
        )
    ):
        tmp = os.path.join(wd, f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))

    accept = os.path.join(wd, "accept")
    reject = os.path.join(wd, "reject")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = gated_ingest_stream(
        stream, weights, accept, reject, os.path.join(wd, "ckpt")
    )
    _drain(q)
    acc = spark.read.option("basePath", accept).parquet(
        os.path.join(accept, "batch=*")
    ).select("doc_id", F.col("batch").cast("string").alias("batch"))
    rej = spark.read.option("basePath", reject).parquet(
        os.path.join(reject, "batch=*")
    ).select("doc_id", F.col("batch").cast("string").alias("batch"))
    return (
        acc.withColumn("decision", F.lit("accept"))
        .unionByName(rej.withColumn("decision", F.lit("reject")))
        .orderBy("doc_id", "batch")
    )


@query(
    "q_stream_mix_monitor",
    oracle="""
    WITH s AS (
      SELECT source AS domain, count(*) AS n_docs FROM documents GROUP BY 1
    ),
    k AS (SELECT count(*) AS nd FROM s),
    tot AS (SELECT sum(n_docs) AS total FROM s),
    r AS (
      SELECT domain,
             CAST(n_docs AS BIGINT) AS n_docs,
             floor(n_docs / CAST(total AS DOUBLE) * 10000 + 0.5) / 10000
                 AS obs_frac,
             floor(1.0 / nd * 10000 + 0.5) / 10000 AS tgt_frac
      FROM s, k, tot
    )
    SELECT domain, n_docs, obs_frac, tgt_frac,
           floor((obs_frac - tgt_frac) * 10000 + 0.5) / 10000 AS drift,
           CAST(CASE WHEN abs(obs_frac - tgt_frac) > 0.02 THEN 1 ELSE 0 END
                AS BIGINT) AS over
    FROM r
    """,
    tags=("streaming",),
)
def q_stream_mix_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live corpus-mixture drift monitor (streaming/monitor.py): each
    micro-batch appends ONE tiny per-domain count aggregate under a
    batch-keyed overwrite partition; the drift report reads only those
    O(batches x domains) stats rows — the corpus is scanned exactly once
    by the stream itself, never by the report. Target mixture here is
    uniform over the observed domains, so the availableNow drain makes
    the cumulative report equal a plain GROUP BY over the table — which
    is precisely what the SQL oracle hash-checks (a live streaming query
    with an EXACT oracle, like q_stream_enrich).

    Scale: the per-batch aggregate is domains x 1 rows (KBs) with
    map-side combine absorbing the scan; monitoring cost is independent
    of corpus size — the same index-tracks-the-batch contract as the
    dedup band index and the HLL sketch table, pytest-pinned for
    conservation and redelivery idempotence in tests/test_monitor.py."""
    from kafka_map_reduce_spark.sources import load_table
    from kafka_map_reduce_spark.streaming.monitor import (
        mixture_drift_report,
        mixture_monitor_stream,
    )

    wd = _work_dir(sf_dir, "mix_monitor")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src = os.path.join(wd, "src")
    docs.repartitionByRange(3, "doc_id").write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stats = os.path.join(wd, "stats")
    _drain(
        mixture_monitor_stream(stream, stats, os.path.join(wd, "ckpt"))
    )
    n_domains = docs.select("source").distinct().count()
    targets = (
        docs.select(F.col("source").alias("domain"))
        .distinct()
        .withColumn("tgt_frac", F.lit(1.0) / F.lit(float(n_domains)))
    )
    return mixture_drift_report(spark, stats, targets).orderBy("domain")


def _watermark_dedup_run(spark: SparkSession, sf_dir: str):
    """Shared core of q_stream_dedup_watermark: returns (result_df,
    audit) where audit carries the state-boundedness evidence
    (max_state_rows, n_batches) that the registered face can't put in
    its output schema — tests/test_watermark_dedup.py asserts on it."""
    from kafka_map_reduce_spark.sources import load_table
    from kafka_map_reduce_spark.streaming.pipeline import drain_query

    wd = _work_dir(sf_dir, "wm_dedup")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    redelivered = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    src = os.path.join(wd, "src")
    n_files = 4
    redelivered.repartitionByRange(n_files, "ts").write.parquet(src)
    # Pin replay order to event-time order (the SCALE_SPOT_r10 lesson:
    # FileStreamSource admits files oldest-mtime-first, but parallel
    # write tasks finish in arbitrary order — unpinned, the watermark
    # can jump ahead on an out-of-order range and drop whole earlier
    # ranges as late; 56% loss observed at sf10). part-NNNNN names sort
    # with the range partitioning, so strictly increasing mtimes in
    # name order reproduce the in-order delivery a real log source
    # (Kafka per-partition order) provides by construction.
    import time as _time

    t_base = _time.time() - 10 * n_files - 60
    for i, name in enumerate(sorted(os.listdir(src))):
        if name.startswith("part-"):
            os.utime(os.path.join(src, name), (t_base + i, t_base + i))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = os.path.join(wd, "out")
    q = (
        deduped.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(wd, "ckpt"))
        .start(out)
    )
    drain_query(q, 300.0)
    max_state = 0
    n_batches = 0
    for p in q.recentProgress:
        n_batches += 1
        for so in (p.get("stateOperators") or []):
            max_state = max(max_state, so.get("numRowsTotal", 0))
    res = spark.read.parquet(out).select("event_id", "user_id", "event_type")
    return res, {"max_state_rows": max_state, "n_batches": n_batches}


@query(
    "q_stream_dedup_watermark",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming", "stateful"),
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATE-BOUNDED production form of q_stream_dedup (r10 verdict
    item #6): ``dropDuplicatesWithinWatermark`` over a redelivered
    multi-batch file replay (every 10th record duplicated, duplicates
    carrying the ORIGINAL event time — the at-least-once redelivery
    shape of lib.rs:944-994's commit seam, where a redelivered batch
    replays the same records, not new ones).

    Why this exists alongside q_stream_dedup (plain dropDuplicates on
    the batch face): unbounded streaming dropDuplicates keeps EVERY key
    ever seen — at 110M events the r10 scale audit measured the decade
    ratio cliff at 32.9x as state spills. The watermark-bounded form
    holds only keys younger than the 30-minute event-time horizon
    (state ~ arrival rate x horizon: max 1.23M rows vs 110M, decade
    8.1x — SCALE_SPOT_r10 watermark_dedup100). It stays EXACT under the
    redelivery contract because a duplicate carries its original ts and
    range-partitioned replay delivers it inside the horizon — so the
    oracle is the full batch-DISTINCT face, hash-compared, not a
    rows-only declaration. State boundedness itself is pinned in
    tests/test_watermark_dedup.py via _watermark_dedup_run's audit."""
    res, _ = _watermark_dedup_run(spark, sf_dir)
    return res
