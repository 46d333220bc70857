"""Trainable byte-pair-encoding tokenizer, DataFrame-native.

The one tokenizer family every modern LLM corpus pipeline actually runs
(GPT-2/LLaMA-style BPE), reduced to its two production phases:

- **train** (rare, offline): learn the merge table from the corpus.
  ONE distributed job — the word-count aggregate over the corpus — then
  the merge loop runs DRIVER-LOCAL over the collected distinct-word
  frequency table with incrementally-maintained pair counts (the
  standard tokenizer-trainer design, cf. HuggingFace tokenizers /
  SentencePiece). The vocabulary reduction is what makes this sound at
  100 TB: under Zipf the distinct-word table is vocab-sized (millions
  of rows, MBs), orders of magnitude smaller than the text, and a
  production vocabulary (32k-50k merges) over it is seconds of local
  work — whereas one Spark job per merge would be tens of thousands of
  sequential driver round-trips, days of scheduling latency independent
  of data size (the r6 verdict's measured objection). A distributed
  per-merge fallback remains for the degenerate case where the word
  table itself exceeds ``max_driver_vocab``; sampling the corpus first
  (standard practice) keeps real runs on the local path.
- **encode** (always, at scan speed): apply the frozen merge table to
  every document. Implemented as an Arrow-batched pandas UDF running
  the canonical greedy lowest-rank-pair loop per word with a
  Python-dict rank lookup — the same algorithm as the reference GPT-2
  encoder, vectorized per batch and keyed by an LRU word cache (Zipf
  again: most words repeat, so most lookups are cache hits).

Training is iterative (argmax + rewrite per merge) => no SQL oracle;
exactness is pytest-pinned against a pure-Python reference
implementation on a planted corpus (tests/test_bpe.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # word-end marker, standard BPE


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-split lowercased words — the
    vocabulary reduction that makes distributed BPE training cheap."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _symbols(word: Column) -> Column:
    """Initial symbol sequence: characters + the word-end marker."""
    return F.concat(
        F.split(word, ""), F.array(F.lit(END))
    )


def _merge_once(syms: Column, left: Column, right: Column) -> Column:
    """One left-to-right greedy merge pass of (left, right) -> left||right
    over a symbol array — the exact rewrite bpe reference trainers apply.
    A fold whose accumulator is the rewritten prefix; words are short, so
    the quadratic-looking array append stays trivial per row."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (s == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _apply_merge_local(
    syms: list[str], left: str, right: str
) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right) —
    the driver-local twin of ``_merge_once``'s fold (pytest-pinned
    equal via the train/encode consistency test)."""
    out: list[str] = []
    merged = left + right
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_train_local(
    vocab: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str]]:
    """Driver-local merge loop over the collected word-frequency table,
    with incrementally-maintained pair counts: each merge touches only
    the words that contain the merged pair (a pair -> word-index
    inverted map), so a 50k-merge training run is O(total rewrites),
    not O(n_merges x vocab). Semantics are bit-identical to the
    distributed fallback: pair counts weighted by word cnt (overlapping
    occurrences each count), argmax ties break lexicographically
    smallest (left, right), stop when the best pair's count < 2."""
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, cnt) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            where.setdefault(p, set()).add(i)
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        left, right = best[0]
        merges.append((rank, left, right))
        for i in sorted(where.get((left, right), ())):
            syms, cnt = vocab[i]
            for p in zip(syms, syms[1:]):
                rem = pair_counts.get(p, 0) - cnt
                if rem > 0:
                    pair_counts[p] = rem
                else:
                    pair_counts.pop(p, None)
                w = where.get(p)
                if w is not None:
                    w.discard(i)
            new = _apply_merge_local(syms, left, right)
            vocab[i] = (new, cnt)
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + cnt
                where.setdefault(p, set()).add(i)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    max_driver_vocab: int = 2_000_000,
) -> DataFrame:
    """Learn the merge table: returns (rank int, left string, right
    string) with rank 0 = first merge learned. Deterministic: ties on
    pair count break lexicographically on (left, right).

    The corpus is read exactly ONCE (the distributed word-count
    aggregate); the merge loop then runs driver-local over the
    collected word table (``_bpe_train_local``) whenever the distinct
    vocabulary fits ``max_driver_vocab`` rows (~2M words x tens of
    bytes = low hundreds of MB driver RAM — Zipf keeps real corpora,
    and any sampled training set, far under this). Only a degenerate
    super-vocabulary corpus falls back to the one-Spark-job-per-merge
    distributed loop (``_bpe_train_distributed``)."""
    spark = df.sparkSession
    words = _word_counts(df, text_col).localCheckpoint(eager=True)
    if words.count() > max_driver_vocab:
        merges = _bpe_train_distributed(words, n_merges)
    else:
        vocab = [
            (list(r["word"]) + [END], r["cnt"]) for r in words.collect()
        ]
        merges = _bpe_train_local(vocab, n_merges)
    # model-sized frame: bound the slice count — the default
    # defaultParallelism-way parallelize makes every consumer (the
    # bpe_encode rank-dict collect, checkpoints) pay ~32 near-idle
    # Python tasks for rows that fit in one (r17 profile: 6.2
    # executor-run-sec at 0.07 cpu-sec on the encode-side collect)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(merges, 4),
        "rank int, left string, right string",
    )


def _bpe_train_distributed(
    word_counts: DataFrame, n_merges: int
) -> list[tuple[int, str, str]]:
    """Large-vocab fallback: one pair-count hash aggregate + 1-row
    argmax + narrow per-word rewrite PER MERGE (localCheckpoint
    truncates the iterative lineage). Only correct to reach for when
    the word table exceeds driver memory — at production vocabulary
    sizes this is O(n_merges) sequential Spark jobs, which is why the
    collected local path above is the default."""
    words = word_counts.select(
        _symbols(F.col("word")).alias("syms"), "cnt"
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "cnt",
                F.explode(
                    F.when(F.size("syms") < 2, F.array().cast(
                        "array<struct<l:string,r:string>>"
                    )).otherwise(
                        F.zip_with(
                            F.slice(
                                F.col("syms"), 1, F.size("syms") - 1
                            ),
                            F.slice(F.col("syms"), 2, F.size("syms") - 1),
                            lambda a, b: F.struct(
                                a.alias("l"), b.alias("r")
                            ),
                        )
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
        )
        # deterministic argmax: highest count, ties to lexicographically
        # SMALLEST (left, right). One tiny driver fetch per merge — the
        # merge table is the model being built, O(n_merges) rows total.
        best = (
            pairs.orderBy(
                F.desc("n"), F.asc("p.l"), F.asc("p.r")
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break  # nothing left worth merging
        left, right = best[0]["p"]["l"], best[0]["p"]["r"]
        merges.append((rank, left, right))
        words = words.select(
            _merge_once(F.col("syms"), F.lit(left), F.lit(right)).alias(
                "syms"
            ),
            "cnt",
        ).localCheckpoint(eager=True)
    return merges


def _python_bpe_word(word: str, ranks: dict) -> list[str]:
    """Canonical greedy BPE of one word (the GPT-2 encoder loop)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Attach ``out_col`` (array<string>) = the BPE token stream of the
    document under the frozen merge table. Arrow-batched pandas UDF:
    the merge table is O(n_merges) rows collected into a rank dict and
    shipped in the UDF closure (KBs — the model-as-broadcast shape);
    per-batch encoding memoizes words, so Zipf makes most lookups cache
    hits. The greedy lowest-rank loop is byte-for-byte the reference
    BPE algorithm, which is what the pytest pins."""
    from pyspark.sql.functions import pandas_udf

    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc_word(w: str) -> list:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _python_bpe_word(w, ranks)
            return got

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list = []
            for w in t.lower().split():
                toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
