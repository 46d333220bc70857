"""Corpus-assembly queries: the steps between "filtered documents" and
"training batches" — sequence packing, domain-mixture weights, and
line-level boilerplate scoring. None of these exist in the reference
(its surface stops at the two README audit queries, README.md:89-113);
they are part of the engine's training-data-pipeline tier alongside
tierc_dedup / tierc_text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.operators.ids import running_total
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table

# Context-window budget for q_pack_sequences. Small enough that sf0.01
# docs (~100-200 tokens) regularly cross boundaries, so the `crosses`
# column exercises both branches.
_PACK_BUDGET = 512


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM t
    )
    SELECT doc_id, n_tokens, cum_before,
           CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS seq_offset,
           CAST(CASE WHEN n_tokens > 0
                      AND (cum_before + n_tokens - 1) // {_PACK_BUDGET}
                          > cum_before // {_PACK_BUDGET}
                     THEN 1 ELSE 0 END AS BIGINT) AS crosses
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing manifest: concatenate the token stream
    in doc_id order and split every 512 tokens; each doc gets the
    sequence it starts in, its offset there, and whether it crosses a
    boundary. The packing itself is entirely determined by the exclusive
    prefix sum of token counts, which is the scale-critical part.

    100 TB design: the naive ``SUM() OVER (ORDER BY doc_id)`` is a
    single-reducer plan. :func:`operators.ids.running_total` replaces it
    with the two-phase enumeration shape (range shuffle + per-physical-
    partition local window + O(partitions) offsets broadcast) — both
    O(rows) exchanges carry only (doc_id, n_tokens), 16 bytes/row, and
    the window groups are synthetic partition ids, so no data skew can
    concentrate them. The doc text never moves."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    c = running_total(t, ["doc_id"], "n_tokens", "cum_before")
    b = F.lit(_PACK_BUDGET)
    seq_id = F.floor(F.col("cum_before") / b)
    return c.select(
        "doc_id",
        "n_tokens",
        "cum_before",
        seq_id.cast("long").alias("seq_id"),
        (F.col("cum_before") % b).cast("long").alias("seq_offset"),
        F.when(
            (F.col("n_tokens") > 0)
            & (F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / b) > seq_id),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("crosses"),
    )


@query(
    "q_sample_temperature",
    oracle="""
    WITH c AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    s AS (
      SELECT source, n_docs, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
               AS BIGINT) AS score
      FROM c
    )
    SELECT source, n_docs, n_tokens,
           CAST(floor(CAST(score AS DOUBLE) * 1000000
                      / (SELECT sum(score) FROM s) + 0.5) AS BIGINT)
             AS weight_ppm
    FROM s
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain-mixture weights (T=2, i.e. p_i proportional
    to tokens_i^0.5) — the multilingual/multi-domain sampling step of
    mT5-style corpus mixing, keyed on the `source` column.

    Determinism across engines is engineered, not assumed: sqrt is
    exactly rounded under IEEE-754 (unlike pow, which is only
    faithfully rounded and may differ between Java and C math libs), the
    per-source score is snapped to an integer BEFORE the global sum (so
    summation order cannot perturb low bits), and the final weight is a
    single double division of exactly-representable integers — identical
    in Spark and DuckDB bit for bit. Output is integer parts-per-million.

    Scale: one partial+final aggregate over the corpus keyed by source
    (bounded domain cardinality), then a broadcast of the one-row total;
    no data-sized shuffle beyond the first aggregate."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).cast("long").alias("n_tokens"),
    )
    s = c.withColumn(
        "score",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000 + F.lit(0.5)).cast(
            "long"
        ),
    )
    tot = s.agg(F.sum("score").alias("__tot"))
    return (
        s.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.floor(
                F.col("score").cast("double") * 1000000 / F.col("__tot") + F.lit(0.5)
            )
            .cast("long")
            .alias("weight_ppm"),
        )
    )


# Line length (tokens) for boilerplate scoring; non-overlapping.
_LINE_TOKENS = 20


@query(
    "q_text_boilerplate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS a FROM documents
    ),
    lines AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(a, i * {_LINE_TOKENS} + 1,
                             i * {_LINE_TOKENS} + {_LINE_TOKENS}), ' ')) AS h
      FROM toks,
           unnest(range(0, greatest(
             CAST(ceil(len(a) / {_LINE_TOKENS}.0) AS BIGINT), 1))) AS t(i)
    ),
    cnt AS (SELECT h, count(*) AS occ FROM lines GROUP BY h)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_lines,
           CAST(floor(CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      * 10000 / count(*) + 0.5) AS BIGINT) AS dup_pm
    FROM lines JOIN cnt USING (h)
    GROUP BY doc_id
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style line-level duplication score: split each
    doc into non-overlapping 20-token lines, count each line's global
    occurrences, and report per doc how many of its lines are shared
    with the rest of the corpus (boilerplate headers/footers score high
    and get dropped by the downstream gate).

    100 TB design: lines materialize as a narrow 1->N transform (no
    shuffle); the only corpus-sized exchanges are the line-hash count
    aggregate and the join back — both keyed on md5(line), 16 bytes, so
    shuffle width is independent of line text length; the final per-doc
    rollup shuffles (doc_id, flag) pairs. Hot lines (the very
    boilerplate being measured) skew the count aggregate's reduce side,
    but partial aggregation collapses them map-side first — each
    partition contributes one row per distinct line, which is the same
    guarantee the exact-dedup digest shuffle relies on.

    The line construction is operators/dedup.py:line_hashes — shared
    with the incremental/streaming line index, so the batch score and
    the per-batch ingest provably hash the same lines."""
    from kafka_map_reduce_spark.operators.dedup import line_hashes

    d = load_table(spark, sf_dir, "documents")
    lines = line_hashes(d, "text", "doc_id", line_tokens=_LINE_TOKENS).select(
        F.col("id").alias("doc_id"), "h"
    )
    cnt = lines.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    dup = F.when(F.col("occ") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        lines.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(dup).cast("long").alias("n_dup_lines"),
            F.floor(
                F.sum(dup).cast("double") * 10000 / F.count(F.lit(1)) + F.lit(0.5)
            )
            .cast("long")
            .alias("dup_pm"),
        )
    )
