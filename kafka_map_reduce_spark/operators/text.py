"""Text analysis operators (Tier C, SURVEY §2.2): tokenization, quality
scoring, language-ID heuristic, document fingerprinting, token counting.

Everything SQL-expressible stays in JVM built-ins; only the n-gram
language model and the winnowing fingerprint drop to Arrow-batched pandas
UDFs (never row-at-a-time Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")


def tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def quality_score(text_col: Column) -> Column:
    """Deterministic quality heuristics: length, punctuation ratio,
    stopword ratio, mean token length — combined into a 0..1-ish score.
    All built-ins, identical formula mirrored in oracle SQL."""
    toks = tokens(text_col)
    n_chars = F.length(text_col).cast("double")
    n_toks = F.size(toks).cast("double")
    punct = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, r"[.,;:!?]", ""))
    ).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(list(STOPWORDS)))).cast("double")
    mean_tok_len = (n_chars - (n_toks - 1)) / F.greatest(n_toks, F.lit(1.0))
    return (
        F.least(n_chars / 1000.0, F.lit(1.0)) * 0.25
        + (1.0 - F.least(punct / F.greatest(n_toks, F.lit(1.0)), F.lit(1.0))) * 0.25
        + F.least(stop_hits / F.greatest(n_toks, F.lit(1.0)) * 5.0, F.lit(1.0)) * 0.25
        + F.least(mean_tok_len / 10.0, F.lit(1.0)) * 0.25
    )


# Tiny per-language stopword/char profiles for the n-gram heuristic.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in"},
    "de": {"der", "die", "und", "ist", "nicht", "das"},
    "fr": {"le", "la", "et", "est", "les", "des"},
    "es": {"el", "la", "que", "de", "los", "es"},
    "zh": set(),  # no-latin-token heuristic handled by char ranges below
}


@F.pandas_udf(StringType())
def lang_id(text: pd.Series) -> pd.Series:
    """n-gram/stopword language heuristic (deterministic argmax, ties by
    language code)."""

    def detect(s: str) -> str:
        if not s:
            return "und"
        if any("一" <= ch <= "鿿" for ch in s[:200]):
            return "zh"
        toks = set(s.lower().split())
        scores = {
            lang: len(toks & prof) for lang, prof in _LANG_PROFILES.items() if prof
        }
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        return best[0] if best[1] > 0 else "en"

    return text.map(detect)


@F.pandas_udf(LongType())
def winnow_fingerprint(text: pd.Series) -> pd.Series:
    """Winnowing document fingerprint: min-of-window over k-gram rolling
    hashes (k=8, window=4), XOR-folded to one 64-bit value."""
    K, W, MOD, BASE = 8, 4, (1 << 61) - 1, 257

    def fp(s: str) -> int:
        s = s.lower()
        if len(s) < K:
            return 0
        hashes = []
        h, power = 0, pow(BASE, K - 1, MOD)
        for i, ch in enumerate(s):
            h = (h * BASE + ord(ch)) % MOD
            if i >= K - 1:
                hashes.append(h)
                h = (h - ord(s[i - K + 1]) * power) % MOD
        out = 0
        for j in range(0, max(len(hashes) - W + 1, 1)):
            out ^= min(hashes[j : j + W])
        return out - (1 << 63) if out >= (1 << 63) else out

    return text.map(fp).astype("int64")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per document (JVM regexp)."""
    return df.withColumns(
        {
            "ws_tokens": F.size(tokens(F.col(text_col))).cast("long"),
            "bpe_ish_tokens": F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast(
                "long"
            ),
        }
    )
