"""Trainable byte-pair-encoding tokenizer, DataFrame-native.

The one tokenizer family every modern LLM corpus pipeline actually runs
(GPT-2/LLaMA-style BPE), reduced to its two production phases:

- **train** (rare, offline): learn the merge table from the corpus.
  Distributed via the classic vocabulary reduction — pair statistics
  over the DISTINCT-WORD table weighted by word frequency, not over the
  raw corpus: at 100 TB the distinct-word table is orders of magnitude
  smaller than the text (Zipf), and every merge iteration is ONE
  pair-count hash aggregate over it plus a narrow per-word rewrite.
  Sampling the corpus first (standard practice for tokenizer training)
  shrinks it further; the operator takes whatever DataFrame you give it.
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


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 30
) -> DataFrame:
    """Learn the merge table: returns (rank int, left string, right
    string) with rank 0 = first merge learned. Deterministic: ties on
    pair count break lexicographically on (left, right).

    Per merge iteration: explode adjacent symbol pairs of the distinct
    words weighted by cnt -> ONE pair-count hash aggregate (map-side
    combine absorbs the Zipf head) -> 1-row argmax -> narrow per-word
    rewrite, localCheckpoint to truncate the iterative lineage. The
    corpus itself is read exactly once (the word-count aggregate)."""
    words = (
        _word_counts(df, text_col)
        .select(_symbols(F.col("word")).alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
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
    return spark.createDataFrame(
        merges, "rank int, left string, right string"
    )


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
