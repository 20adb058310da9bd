"""Text analysis over a (doc_id, text) corpus — pure Catalyst expressions.

Every function is a DataFrame→DataFrame transform built from JVM-side
pyspark.sql.functions (whole-stage codegen; no Python in the hot path),
so at 100 TB each is a single scan + optional shuffle.

- token_stats:   tokenization + length stats
- quality_score: boilerplate/quality heuristics (stopword ratio, token
                 length, digit ratio) → one score
- lang_id:       n-gram/stopword-hit heuristic language guess
- fingerprint:   md5 content fingerprint of normalized text (exact-dup
                 key) — the winnowing-style shingle fingerprint lives in
                 dedup.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_stats", "quality_score", "lang_id", "fingerprint", "STOPWORDS"]

STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]

# tiny per-language cue lists for the heuristic guesser
LANG_CUES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "query", "fast"],
    "es": ["el", "la", "de", "y", "datos", "consulta"],
    "de": ["der", "die", "das", "und", "daten", "abfrage"],
    "fr": ["le", "la", "de", "et", "données", "requête"],
    "zh": ["的", "是", "在", "和", "数据", "查询"],
}


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, n_tokens, n_chars, avg_token_len (whitespace tokenizer)."""
    toks = F.split(F.col(text_col), " ")
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            (F.length(text_col) - F.size(toks) + 1) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword / digit heuristics → quality in [0, 1].

    score = 0.4·stop_sat + 0.3·len_sat + 0.3·(1 − digit_ratio), where
    stop_sat saturates at 10% stopwords and len_sat at 100 tokens —
    a standard shape for web-corpus quality filters (C4/Gopher-style
    rules re-expressed as columnar arithmetic).
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    digit_chars = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    stop_ratio = n_stop / n_tokens
    digit_ratio = digit_chars / F.greatest(F.length(text_col), F.lit(1))
    stop_sat = F.least(stop_ratio / F.lit(0.1), F.lit(1.0))
    len_sat = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(0.4 * stop_sat + 0.3 * len_sat + 0.3 * (1 - digit_ratio), 4).alias(
            "quality"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language guess: per-language *distinct* cue-token hit
    counts → argmax (deterministic tiebreak by language code).

    array_intersect instead of a filter-lambda: HOF lambdas evaluate
    interpreted (~µs per element — 25s for 5k docs × 5 languages at
    sf0.1), while array_intersect is a plain codegen'd expression."""
    toks = F.split(F.col(text_col), " ")

    def hits(cues: list[str]):
        return F.size(F.array_intersect(toks, F.array(*[F.lit(c) for c in cues])))

    hit_cols = [hits(cues).alias(f"hits_{lang}") for lang, cues in sorted(LANG_CUES.items())]
    scored = df.select("doc_id", *hit_cols)
    langs = sorted(LANG_CUES)
    best = F.greatest(*[F.col(f"hits_{lng}") for lng in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"hits_{lng}") == best, F.lit(lng)) for lng in langs]
    )
    return scored.select(
        "doc_id", guess.alias("lang_guess"), best.alias("cue_hits")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed text."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fingerprint"))
