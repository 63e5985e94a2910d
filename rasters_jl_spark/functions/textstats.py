"""Text analysis for training-data pipelines: token stats, quality score,
language-ID heuristic, document fingerprinting.

Everything is built from JVM-side built-ins (split / array higher-order
functions / md5) — no Python in the hot path — and every formula has an
exact DuckDB translation used by the correctness oracle. Constants are
shared so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# Gopher quality & repetition signals (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Appendix A1) — the standard webtext curation rule
# set. Every signal is a pure higher-order column expression over the
# token/line arrays: per-row compute, zero shuffle, codegen end-to-end.
# The O(n²) in-array occurrence counts (top-2-gram, duplicate lines) are
# per-DOCUMENT costs bounded by doc length — they never cross the wire.
# ---------------------------------------------------------------------------

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_ALPHA = 0.8
GOPHER_MIN_STOPS = 2
GOPHER_MAX_TOP2 = 0.20
GOPHER_MAX_DUP_LINE = 0.30


def gopher_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    min_stops: int = GOPHER_MIN_STOPS,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_words,
    top2gram_char_frac, dup_line_frac, gopher_pass): the Gopher A1 filter
    signals and their published accept thresholds. Character fractions
    are over the single-space-normalized text (whitespace runs carry no
    signal); ratios round to 6 dp for engine portability. ``min_words``/
    ``min_stops`` are overridable because those two rules are corpus- and
    language-dependent (the stop-word gate is English-prose-specific —
    Rae et al. note the same); the repetition thresholds are not."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    n = F.size(words)
    total_chars = F.length(F.array_join(words, " "))
    mwl = F.round(
        F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
        / F.greatest(n, F.lit(1)),
        6,
    )
    alpha = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
        / F.greatest(n, F.lit(1)).cast("double"),
        6,
    )
    stops = F.size(F.array_intersect(F.array_distinct(words), F.array(*[F.lit(s) for s in GOPHER_STOPS])))
    # word 2-grams; chars covered by the most frequent one / total chars
    g2 = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top2_chars = F.aggregate(
        F.array_distinct(g2),
        F.lit(0).cast("long"),
        lambda acc, g: F.greatest(
            acc,
            (F.size(F.filter(g2, lambda x: x == g)) * F.length(g)).cast("long"),
        ),
    )
    top2 = F.round(top2_chars / F.greatest(total_chars, F.lit(1)).cast("double"), 6)
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.length(F.trim(l)) > 0)
    nl = F.size(lines)
    dup_line = F.round(
        (nl - F.size(F.array_distinct(lines))) / F.greatest(nl, F.lit(1)).cast("double"), 6
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep],
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha.alias("frac_alpha_words"),
        stops.alias("n_stop_words"),
        top2.alias("top2gram_char_frac"),
        dup_line.alias("dup_line_frac"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MWL)
        & (F.col("mean_word_len") <= GOPHER_MAX_MWL)
        & (F.col("frac_alpha_words") > GOPHER_MIN_ALPHA)
        & (F.col("n_stop_words") >= min_stops)
        & (F.col("top2gram_char_frac") <= GOPHER_MAX_TOP2)
        & (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE)
    )
    return out.withColumn("gopher_pass", passes)


def tfidf_topk(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, rank, term, tfidf): each document's top-k characteristic
    terms, tf × ln(N/df). Plan: one groupBy builds the corpus df table
    (vocab-sized — broadcast below; at an unbounded web vocabulary swap
    the hint for a shuffle join), one groupBy builds per-doc tf, one
    per-doc window ranks. Ranking happens on the 6-dp ROUNDED score with
    a term tiebreak, so both engines produce the identical top-k."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)).alias("term"),
    )
    n_docs = docs.count()  # scalar, table-stats class
    df_tbl = words.distinct().groupBy("term").agg(F.count("*").alias("df"))
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    scored = tf.join(F.broadcast(df_tbl), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tfidf")
    )


def unigram_logloss(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, bits_per_token): per-document cross-entropy under
    the corpus's own unigram MLE model — the fully-SQL-expressible stand-in
    for CCNet's LM-perplexity quality bucket (Wenzek et al. 2020 drop the
    worst-perplexity tail): documents made of globally rare words score
    high, boilerplate-like documents of frequent words score low. No
    smoothing needed — every scored word exists in the corpus model.

    Plan: ONE word-frequency groupBy (the same table BPE trains on),
    broadcast back against the exploded words (vocabulary is the
    metadata-scale side), one per-doc aggregation. log2 at 6 dp so the
    DuckDB oracle agrees exactly."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)).alias("w"),
    )
    wf = words.groupBy("w").agg(F.count("*").alias("cnt"))
    n_total = words.count()  # scalar, table-stats class
    # per-word bits rounded to 6 dp, summed as integer micro-units — the
    # partial-agg float-sum order can't move the result across a rounding
    # boundary (same discipline as the ivfpq ADC sums)
    bits = F.round(-F.log2(F.col("cnt") / F.lit(float(n_total))), 6)
    micro = F.round(bits * 1e6).cast("long")
    scored = words.join(F.broadcast(wf), "w").select("doc_id", micro.alias("_u"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.round(F.sum("_u") / (F.count("*") * 1e6), 6).alias("bits_per_token"),
    )
