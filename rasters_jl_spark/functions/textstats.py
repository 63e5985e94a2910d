"""Text analysis for training-data pipelines: token stats, quality score,
language-ID heuristic, document fingerprinting.

Everything is built from JVM-side built-ins (split / array higher-order
functions / md5) — no Python in the hot path — and every formula has an
exact DuckDB translation used by the correctness oracle. Constants are
shared so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
# function-word lists for the toy n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
}


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (chars/4 heuristic
    blended with word count — the standard quick token estimator)."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    bpe_est = F.ceil(n_char / F.lit(4))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_m"),
        bpe_est.cast("bigint").alias("bpe_est"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-word-length quality features + score.

    score = 0.4*min(1, n_tokens/100) + 0.4*stop_ratio*5 (capped 0.4)
          + 0.2*(1 if 3 <= mean_wlen <= 8 else 0)      — all deterministic.
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = n_stop.cast("double") / n_tok
    mean_wlen = (F.length(F.col(text_col)) - (n_tok - 1)).cast("double") / n_tok
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
        + F.least(F.lit(0.4), F.lit(0.4) * stop_ratio * F.lit(5.0))
        + F.when((mean_wlen >= 3.0) & (mean_wlen <= 8.0), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language scoring; predicted = argmax (ties → 'en' first,
    deterministic CASE order). A stand-in with the same plan shape as a real
    n-gram language model (per-token lookup against a broadcast table)."""
    toks = tokens_col(F.col(text_col))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    pred = (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["de"]), F.lit("en")
        )
        .when(scores["es"] >= scores["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return docs.select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["es"].alias("score_es"),
        scores["de"].alias("score_de"),
        pred.alias("lang_pred"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set — the classic "bag fingerprint" for fuzzy-dup blocking."""
    toks = tokens_col(F.col(text_col))
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return docs.select("doc_id", fp.alias("fingerprint"))
