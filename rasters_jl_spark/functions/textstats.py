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
# Repeated-element counts (top-n-gram coverage, duplicate line/paragraph
# chars) are computed by SORTING the per-document array once and folding a
# longest-equal-run / repeat-char accumulator over adjacent elements —
# O(L log L) per document, so a 100k-word document (the Gopher max-words
# bound, which must still be SCORED to be rejected) costs ~10⁶ comparisons,
# not the ~10¹⁰ of a per-distinct-gram rescan. Nothing crosses the wire.
# The duplicate 5..10-gram OVERLAP-UNION fractions need per-position
# character offsets (a scan, which higher-order columns can't express) and
# live in :func:`dup_ngram_char_fracs` — one doc-keyed exchange.
# ---------------------------------------------------------------------------

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_ALPHA = 0.8
GOPHER_MIN_STOPS = 2
GOPHER_MAX_TOP2 = 0.20
GOPHER_MAX_TOP3 = 0.18
GOPHER_MAX_TOP4 = 0.16
GOPHER_MAX_DUP_LINE = 0.30
GOPHER_MAX_DUP_PARA = 0.30
GOPHER_MAX_DUP_LINE_CHAR = 0.20
GOPHER_MAX_DUP_PARA_CHAR = 0.20
GOPHER_MAX_SYMBOL_RATIO = 0.10
GOPHER_MAX_BULLET_LINE = 0.90
GOPHER_MAX_ELLIPSIS_LINE = 0.30
# duplicate n-gram char-fraction thresholds, n = 5..10 (Rae et al. A1)
GOPHER_MAX_DUP_NGRAM = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
GOPHER_BULLETS = ("•", "●", "*", "-")


def _kgram_array(words, n, k: int):
    """Array of word k-grams (space-joined); empty when the doc has < k
    words. zip_with chains k aligned slices — per-row, codegen."""
    m = F.greatest(n - (k - 1), F.lit(0))
    g = F.slice(words, 1, m)
    for i in range(1, k):
        g = F.zip_with(g, F.slice(words, i + 1, m), lambda a, b: F.concat_ws(" ", a, b))
    return g


def _max_run_chars(arr):
    """max over distinct elements of (occurrences × element length), via
    ONE fold over the sorted array (equal elements are adjacent, so a
    running (prev, run, best) accumulator sees every occurrence count) —
    O(L log L) sort + O(L) fold, no rescans."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("").alias("p"),
            F.lit(0).cast("long").alias("r"),
            F.lit(0).cast("long").alias("b"),
        ),
        lambda acc, g: F.struct(
            g.alias("p"),
            F.when(g == acc["p"], acc["r"] + 1).otherwise(F.lit(1).cast("long")).alias("r"),
            F.greatest(
                acc["b"],
                (
                    (
                        F.when(g == acc["p"], acc["r"] + 1).otherwise(F.lit(1).cast("long"))
                    )
                    * F.length(g)
                ).cast("long"),
            ).alias("b"),
        ),
        lambda acc: acc["b"],
    )


def _dup_extra_chars(arr):
    """Characters in repeat occurrences (every occurrence beyond the
    first) — same sorted-adjacent fold shape as :func:`_max_run_chars`."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(F.lit("").alias("p"), F.lit(0).cast("long").alias("b")),
        lambda acc, g: F.struct(
            g.alias("p"),
            (acc["b"] + F.when(g == acc["p"], F.length(g).cast("long")).otherwise(F.lit(0))).alias("b"),
        ),
        lambda acc: acc["b"],
    )


def gopher_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    min_stops: int = GOPHER_MIN_STOPS,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher A1 filter battery (quality + repetition) with the
    published accept thresholds: (doc_id, n_words, mean_word_len,
    frac_alpha_words, n_stop_words, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, top2gram_char_frac, top3gram_char_frac,
    top4gram_char_frac, dup_line_frac, dup_para_frac, dup_line_char_frac,
    dup_para_char_frac, gopher_pass).

    Semantics: top-n-gram char fraction = occurrences × gram chars of the
    most repeated word n-gram over the single-space-normalized text
    (whitespace runs carry no signal); duplicate line/paragraph count
    fractions count occurrences beyond the first; their char fractions
    put those repeat occurrences' characters over the total line/
    paragraph characters; symbol_word_ratio = max('#', '...') occurrence
    count over words; bullet/ellipsis line fractions look at trimmed line
    heads/tails. Ratios round to 6 dp for engine portability.
    ``min_words``/``min_stops`` are overridable because those two rules
    are corpus- and language-dependent (the stop-word gate is
    English-prose-specific — Rae et al. note the same); the repetition
    thresholds are not. The duplicate 5..10-gram union-coverage signals
    need a scan and live in :func:`dup_ngram_char_fracs`."""
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
    nd = F.greatest(n, F.lit(1)).cast("double")
    # '#' / ellipsis occurrence counts via length deltas (replace is
    # non-overlapping in both engines, so the counts agree); BOTH ellipsis
    # spellings count — the line-tail signal below treats '…' as an
    # ellipsis, so the symbol gate must too or Unicode-ellipsis spam
    # passes one signal and fails its twin
    tlen = F.length(F.col(text_col))
    n_hash = tlen - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    n_ell = (
        (tlen - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))) / F.lit(3)
        + (tlen - F.length(F.replace(F.col(text_col), F.lit("…"), F.lit(""))))
    )
    symbol_ratio = F.round(F.greatest(n_hash.cast("double"), n_ell) / nd, 6)
    tden = F.greatest(total_chars, F.lit(1)).cast("double")
    top2 = F.round(_max_run_chars(_kgram_array(words, n, 2)) / tden, 6)
    top3 = F.round(_max_run_chars(_kgram_array(words, n, 3)) / tden, 6)
    top4 = F.round(_max_run_chars(_kgram_array(words, n, 4)) / tden, 6)
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.length(F.trim(l)) > 0)
    paras = F.filter(F.split(F.col(text_col), "\n\n"), lambda p: F.length(F.trim(p)) > 0)
    nl = F.size(lines)
    np_ = F.size(paras)
    nld = F.greatest(nl, F.lit(1)).cast("double")
    npd = F.greatest(np_, F.lit(1)).cast("double")
    dup_line = F.round((nl - F.size(F.array_distinct(lines))) / nld, 6)
    dup_para = F.round((np_ - F.size(F.array_distinct(paras))) / npd, 6)
    line_chars = F.aggregate(lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l))
    para_chars = F.aggregate(paras, F.lit(0).cast("long"), lambda a, p: a + F.length(p))
    dup_line_chars = F.round(
        _dup_extra_chars(lines) / F.greatest(line_chars, F.lit(1)).cast("double"), 6
    )
    dup_para_chars = F.round(
        _dup_extra_chars(paras) / F.greatest(para_chars, F.lit(1)).cast("double"), 6
    )
    bullet_heads = F.array(*[F.lit(b) for b in GOPHER_BULLETS])
    bullet = F.round(
        F.size(
            F.filter(lines, lambda l: F.array_contains(bullet_heads, F.substring(F.trim(l), 1, 1)))
        )
        / nld,
        6,
    )
    ell_line = F.round(
        F.size(
            F.filter(lines, lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"))
        )
        / nld,
        6,
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep],
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha.alias("frac_alpha_words"),
        stops.alias("n_stop_words"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet.alias("bullet_line_frac"),
        ell_line.alias("ellipsis_line_frac"),
        top2.alias("top2gram_char_frac"),
        top3.alias("top3gram_char_frac"),
        top4.alias("top4gram_char_frac"),
        dup_line.alias("dup_line_frac"),
        dup_para.alias("dup_para_frac"),
        dup_line_chars.alias("dup_line_char_frac"),
        dup_para_chars.alias("dup_para_char_frac"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MWL)
        & (F.col("mean_word_len") <= GOPHER_MAX_MWL)
        & (F.col("frac_alpha_words") > GOPHER_MIN_ALPHA)
        & (F.col("n_stop_words") >= min_stops)
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_LINE)
        & (F.col("top2gram_char_frac") <= GOPHER_MAX_TOP2)
        & (F.col("top3gram_char_frac") <= GOPHER_MAX_TOP3)
        & (F.col("top4gram_char_frac") <= GOPHER_MAX_TOP4)
        & (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE)
        & (F.col("dup_para_frac") <= GOPHER_MAX_DUP_PARA)
        & (F.col("dup_line_char_frac") <= GOPHER_MAX_DUP_LINE_CHAR)
        & (F.col("dup_para_char_frac") <= GOPHER_MAX_DUP_PARA_CHAR)
    )
    return out.withColumn("gopher_pass", passes)


def dup_ngram_char_fracs(
    docs: DataFrame,
    ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dup5gram_char_frac, ..., dup10gram_char_frac,
    repetition_pass): the Gopher A1 duplicate n-gram signals for
    n = 5..10 — the fraction of characters of the single-space-normalized
    text covered by at least one occurrence of a REPEATED n-gram
    (overlapping occurrences' characters counted once, the Rae et al.
    accounting), gated at the published thresholds.

    Needs per-position character offsets (a scan, which zero-shuffle
    higher-order columns can't express), so the plan explodes the token
    stream once and works in doc-keyed windows:
      1. posexplode words; char offsets via one running-sum window over
         (doc_id, pos); every n's gram + char interval [s, e) comes from
         lead() projections over that SAME sorted window — one exchange.
      2. one count window over (doc_id, n, gram) marks repeated grams.
      3. one (doc_id, n)-ordered window computes the classic
         union-of-intervals length (running max of previous ends).
      4. one groupBy(doc_id) pivots the ns into columns.
    Per-doc work is O(L·|ns|) rows through 3 exchanges — the documented
    cost of exact overlap-union at 100 TB; the zero-shuffle battery in
    :func:`gopher_signals` is the cheap first-pass filter."""
    w0 = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("pos", "w"),
    )
    byline = Window.partitionBy("doc_id").orderBy("pos")
    # char offset of word start in the normalized text (single spaces)
    w1 = w0.withColumn(
        "off",
        F.coalesce(
            F.sum(F.length("w") + F.lit(1)).over(byline.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    ).withColumn("_tc", F.max(F.col("off") + F.length("w")).over(Window.partitionBy("doc_id")))
    max_n = max(ns)
    leads_w = [F.lead("w", i).over(byline).alias(f"_w{i}") for i in range(1, max_n)]
    leads_o = [F.lead(F.col("off") + F.length("w").cast("long"), n - 1).over(byline).alias(f"_e{n}") for n in ns]
    w2 = w1.select("doc_id", "pos", "off", "_tc", "w", *leads_w, *leads_o)
    # one struct per (position, n) with the gram text and char interval
    gram_structs = []
    for n in ns:
        parts = [F.col("w")] + [F.col(f"_w{i}") for i in range(1, n)]
        gram_structs.append(
            F.when(
                F.col(f"_w{n - 1}").isNotNull(),
                F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", *parts).alias("gram"),
                    F.col("off").alias("s"),
                    F.col(f"_e{n}").alias("e"),
                ),
            )
        )
    g = w2.select(
        "doc_id",
        "_tc",
        F.explode(
            F.filter(F.array(*gram_structs), lambda s: s.isNotNull())
        ).alias("gr"),
    ).select("doc_id", "_tc", "gr.n", "gr.gram", "gr.s", "gr.e")
    cnt_w = Window.partitionBy("doc_id", "n", "gram")
    dup = g.withColumn("_cnt", F.count("*").over(cnt_w)).where(F.col("_cnt") >= 2)
    # union-of-intervals: covered chars added by each interval beyond the
    # running max of previous interval ends
    ord_w = Window.partitionBy("doc_id", "n").orderBy("s", "e")
    prev_end = F.max("e").over(ord_w.rowsBetween(Window.unboundedPreceding, -1))
    add = F.greatest(F.lit(0).cast("long"), F.col("e") - F.greatest(F.col("s"), F.coalesce(prev_end, F.lit(0))))
    per_n = (
        dup.withColumn("_add", add)
        .groupBy("doc_id", "n")
        .agg(F.sum("_add").alias("_cov"), F.max("_tc").alias("_tc"))
    )
    wide = per_n.groupBy("doc_id").agg(
        *[
            F.round(
                F.coalesce(
                    F.max(F.when(F.col("n") == n, F.col("_cov"))), F.lit(0).cast("long")
                )
                / F.greatest(F.max("_tc"), F.lit(1)).cast("double"),
                6,
            ).alias(f"dup{n}gram_char_frac")
            for n in ns
        ]
    )
    # docs with NO repeated n-gram never reach `dup` — restore them with
    # all-zero fractions via a left join from the doc id spine
    spine = docs.select(F.col(id_col).alias("doc_id"))
    out = spine.join(wide, "doc_id", "left").select(
        "doc_id",
        *[
            F.coalesce(F.col(f"dup{n}gram_char_frac"), F.lit(0.0)).alias(f"dup{n}gram_char_frac")
            for n in ns
        ],
    )
    gate = F.lit(True)
    for n in ns:
        gate = gate & (F.col(f"dup{n}gram_char_frac") <= GOPHER_MAX_DUP_NGRAM[n])
    return out.withColumn("repetition_pass", gate)


C4_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    policy_phrases: tuple = C4_POLICY_PHRASES,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_lines_kept, n_sentences, c4_pass):
    the C4 line-level cleaning battery (Raffel et al. 2020 §2.2, the
    public recipe behind the C4 corpus). Line filters — a line survives
    iff it ends in terminal punctuation ('.', '!', '?', '\"'), has ≥
    ``min_words_per_line`` whitespace words, and contains neither the
    word \"javascript\" nor a boilerplate policy phrase (both
    case-insensitive). Page gates — ``c4_pass`` requires ≥
    ``min_sentences`` sentences in the CLEANED text (counted as
    terminal-punctuation occurrences, the standard heuristic), no
    \"lorem ipsum\" placeholder text, and no '{' (code). ``clean_text``
    joins the surviving lines.

    Plan: one zero-shuffle codegen projection — split on newline, one
    higher-order filter, array_join; same scale shape as the Gopher
    battery (the two are the complementary published cleaning recipes:
    C4 is line-level structural, Gopher is document-level statistical).
    Terminal punctuation is tested with substr/IN rather than a regex so
    the DuckDB oracle shares the exact predicate. NULL text is treated
    as empty (defined output, not NULL propagation); carriage returns
    are stripped first so CRLF crawls don't fail the end-of-line
    punctuation test; per-line words split on runs of whitespace (the
    published recipe), not the engine's single-space token convention.
    ``keep`` passes columns through the projection (the gopher_signals
    pattern) so callers don't re-join the corpus against itself."""
    text0 = F.replace(
        F.coalesce(F.col(text_col), F.lit("")), F.lit("\r"), F.lit("")
    )
    lines = F.split(text0, "\n")
    nl = F.size(lines)

    def keeps(line):
        t = F.trim(line)
        lt = F.lower(t)
        words = F.size(F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0))
        ok = (
            F.substring(t, -1, 1).isin(".", "!", "?", '"')
            & (words >= min_words_per_line)
            & ~lt.contains("javascript")
        )
        for ph in policy_phrases:
            ok = ok & ~lt.contains(ph)
        return ok

    kept = F.filter(lines, keeps)
    clean = F.array_join(kept, "\n")
    n_sent = sum(
        F.length(clean) - F.length(F.replace(clean, F.lit(c), F.lit("")))
        for c in (".", "!", "?")
    )
    low = F.lower(text0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        nl.cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        (
            (n_sent >= min_sentences)
            & ~low.contains("lorem ipsum")
            & ~low.contains("{")
        ).alias("c4_pass"),
        *[F.col(c) for c in keep],
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, rank, term, tfidf): each document's top-k characteristic
    terms, tf × ln(N/df). Plan: one groupBy builds the corpus df table
    (vocab-sized — broadcast by default; ``broadcast=False`` swaps the
    hint for a shuffle join on term when the web vocabulary outgrows the
    driver, see :func:`_model_side`), one groupBy builds per-doc tf, one
    per-doc window ranks. Ranking happens on the 6-dp ROUNDED score with
    a term tiebreak, so both engines produce the identical top-k."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)).alias("term"),
    )
    n_docs = docs.count()  # scalar, table-stats class
    df_tbl = words.distinct().groupBy("term").agg(F.count("*").alias("df"))
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    scored = tf.join(_model_side(df_tbl, broadcast), "term").select(
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
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_words, bits_per_token): per-document cross-entropy under
    the corpus's own unigram MLE model — the fully-SQL-expressible stand-in
    for CCNet's LM-perplexity quality bucket (Wenzek et al. 2020 drop the
    worst-perplexity tail): documents made of globally rare words score
    high, boilerplate-like documents of frequent words score low. No
    smoothing needed — every scored word exists in the corpus model.

    Plan: ONE word-frequency groupBy (the same table BPE trains on),
    broadcast back against the exploded words (vocabulary is the
    metadata-scale side), one per-doc aggregation. The corpus token total
    rides along as SUM(cnt) over the frequency table (broadcast 1-row
    cross join; Spark's ReuseExchange serves both consumers from the one
    groupBy shuffle) — no separate corpus-counting pass. log2 at 6 dp so
    the DuckDB oracle agrees exactly."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)).alias("w"),
    )
    bits = F.round(-F.log2(F.col("cnt") / F.col("_n")), 6)
    scored = words.join(_model_side(_freq_with_total(words, "w"), broadcast), "w").select(
        "doc_id", _micro_units(bits).alias("_u")
    )
    return _bits_per_token(scored)


def _model_side(tbl: DataFrame, broadcast: bool) -> DataFrame:
    """Frequency/model tables are metadata-scale on curated corpora —
    broadcast by default so the corpus side never shuffles. At an
    unbounded web vocabulary (the trigram table can reach billions of
    rows) pass ``broadcast=False`` to fall back to a shuffle join on the
    model keys instead of OOMing the driver with a forced broadcast —
    the same escape-hatch shape as the knn ring-candidate gate
    (operators/knn.py::BROADCAST_ROWS_MAX)."""
    return F.broadcast(tbl) if broadcast else tbl


def _freq_with_total(tokens: DataFrame, col: str) -> DataFrame:
    """(col, cnt, _n): token frequency table with the corpus total riding
    along — SUM(cnt) over the table via a 1-row broadcast cross join;
    Spark's ReuseExchange serves both consumers from the one groupBy
    shuffle, so the corpus is never scanned just to count it. Shared by
    the unigram and bigram LM tiers (one place to change the pattern)."""
    wf = tokens.groupBy(col).agg(F.count("*").alias("cnt"))
    tot = wf.agg(F.sum("cnt").cast("double").alias("_n"))
    return wf.crossJoin(tot)


def _micro_units(bits):
    """6-dp bits → integer micro-units: partial-agg float-sum order can't
    move the total across a rounding boundary (the ivfpq ADC discipline)."""
    return F.round(bits * 1e6).cast("long")


def _bits_per_token(scored: DataFrame) -> DataFrame:
    """(doc_id, n_words, bits_per_token) from per-token micro-units."""
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.round(F.sum("_u") / (F.count("*") * 1e6), 6).alias("bits_per_token"),
    )


def perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_words, bits_per_token, ppl_bucket): CCNet's perplexity
    bucketing (Wenzek et al. 2020 §4.4 — split the corpus into equal-sized
    head/middle/tail by LM perplexity; head = lowest perplexity, i.e. the
    cleanest third) over the :func:`unigram_logloss` score.

    Scale shape — EXACT quantiles without a global sort: per-doc
    bits_per_token is already quantized to 6 dp, so the distribution is a
    HISTOGRAM, not a ranking problem. One groupBy on the micro-unit score
    (metadata-scale output: ≤ the number of distinct 6-dp values, bounded
    by the score range × 10⁶, in practice ≪ corpus rows), one cumulative
    window over that histogram (single-partition but metadata-scale — the
    same class as the LM vocabulary tables), a 1-row cutoff aggregate
    broadcast back, and a codegen CASE. The naive NTILE-over-all-docs
    alternative is a global sort into ONE partition of the full corpus —
    the canonical 100-TB scale-killer this shape exists to avoid.

    Determinism: cutoffs are pure integer arithmetic (cum·n ≥ j·N ⇔
    cum ≥ ⌈j·N/n⌉ for integer cum), ties share a quantized score and
    therefore a bucket, so the split is exactly reproducible in SQL;
    bucket sizes deviate from N/n only by tied-score mass."""
    scored = unigram_logloss(docs, id_col, text_col, broadcast).withColumn(
        "_q", F.round(F.col("bits_per_token") * 1e6).cast("long")
    )
    cuts = _hist_cutoffs(scored, n_buckets)
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "n_words", "bits_per_token",
        _bucket_case(n_buckets).alias("ppl_bucket"),
    )


def _bucket_labels(n_buckets: int) -> list[str]:
    return ["head", "middle", "tail"] if n_buckets == 3 else [
        f"b{j}" for j in range(n_buckets)
    ]


def _hist_cutoffs(scored_q: DataFrame, n_buckets: int) -> DataFrame:
    """1-row (_cut1.._cut{n-1}) exact-quantile cutoffs from the quantized
    ``_q`` score histogram — metadata-scale groupBy + cumulative window,
    never a global NTILE sort (see :func:`perplexity_buckets`)."""
    hist = scored_q.groupBy("_q").agg(F.count("*").alias("_c"))
    cum = hist.select(
        "_q",
        F.sum("_c")
        .over(Window.orderBy("_q").rowsBetween(Window.unboundedPreceding, 0))
        .alias("_cum"),
    ).crossJoin(F.broadcast(hist.agg(F.sum("_c").alias("_N"))))
    return cum.agg(
        *[
            F.min(
                F.when(F.col("_cum") * n_buckets >= F.col("_N") * j, F.col("_q"))
            ).alias(f"_cut{j}")
            for j in range(1, n_buckets)
        ]
    )


def _bucket_case(n_buckets: int):
    """CASE over ``_q`` vs the broadcast ``_cut{j}`` columns."""
    labels = _bucket_labels(n_buckets)
    bucket = None
    for j, lab in zip(range(1, n_buckets), labels[:-1]):
        cond = F.col("_q") <= F.col(f"_cut{j}")
        bucket = F.when(cond, F.lit(lab)) if bucket is None else bucket.when(cond, F.lit(lab))
    return bucket.otherwise(F.lit(labels[-1]))


def ppl_snapshot(
    ref_docs: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """FROZEN quality-bucket state for streaming curation: (vocab, total,
    cutoffs), all trained on a REFERENCE corpus — exactly CCNet's
    production shape (Wenzek et al. 2020 train the KenLM + quantile cuts
    on a reference crawl once and apply them to every new shard). The
    vocab is the metadata-scale unigram table, ``total`` its 1-row token
    count, and the cutoffs come from the reference's own score histogram
    via :func:`_hist_cutoffs`. All three are static stream-side broadcast
    joins — the stream never re-estimates quantiles."""
    words = ref_docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").cast("double").alias("_n"))
    ref_scored = snapshot_score(
        ref_docs, vocab, tot, id_col, text_col, broadcast
    ).withColumn("_q", F.round(F.col("bits_per_token") * 1e6).cast("long"))
    return vocab, tot, _hist_cutoffs(ref_scored, n_buckets)


def snapshot_score(
    docs: DataFrame,
    vocab: DataFrame,
    tot: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_words, bits_per_token) against a FROZEN unigram model.
    Out-of-vocabulary tokens (absent from the reference snapshot) get
    add-half mass: bits = −log2(0.5 / N) — deterministic, SQL-recomputable
    smoothing for the unseen (CCNet's KenLM assigns OOV smoothed mass the
    same way in spirit). Left broadcast join + 1-row total cross join —
    the scored corpus never shuffles on words."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("w"),
    )
    j = words.join(_model_side(vocab, broadcast), "w", "left").crossJoin(
        F.broadcast(tot)
    )
    bits = F.round(
        -F.log2(F.coalesce(F.col("cnt").cast("double"), F.lit(0.5)) / F.col("_n")), 6
    )
    return _bits_per_token(j.select("doc_id", _micro_units(bits).alias("_u")))


def snapshot_bucket(scored: DataFrame, cuts: DataFrame, n_buckets: int = 3) -> DataFrame:
    """Assign ppl_bucket against frozen cutoffs (1-row broadcast CASE)."""
    q = scored.withColumn("_q", F.round(F.col("bits_per_token") * 1e6).cast("long"))
    return q.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "n_words", "bits_per_token",
        _bucket_case(n_buckets).alias("ppl_bucket"),
    )


def bigram_logloss(
    docs: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_words, bits_per_token): per-document cross-entropy under
    an INTERPOLATED BIGRAM model trained on the corpus itself — the tier
    above :func:`unigram_logloss` on the way to CCNet's KenLM perplexity
    buckets (Wenzek et al. 2020): p(wᵢ|wᵢ₋₁) = λ·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) +
    (1−λ)·c(wᵢ)/N, first tokens scored unigram-only. Every consecutive
    pair exists in the model (trained on the same corpus), so no
    smoothing floor is needed; the interpolation still separates
    formulaic from surprising continuations.

    Plan: token pairs come from zipping the word array with a
    NULL-headed shifted copy of itself (prev attached before the explode
    — no window, no doc-keyed exchange, and O(L) per document: an
    element_at(ws, i) inside a higher-order lambda would re-evaluate the
    whole array per element, O(L²) — measured 238 s for ONE 32k-word
    doc); one unigram groupBy (+1-row total via ReuseExchange) and one
    bigram groupBy; three broadcast joins score each token (w, prev,
    prev→w). The bigram table is vocabulary²-bounded but corpus-sparse —
    at an unbounded web vocabulary pass ``broadcast=False`` to swap the
    model-table broadcasts for shuffle joins on their keys
    (:func:`_model_side`). Same 6-dp micro-unit discipline as the
    unigram tier (shared helpers)."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    shifted = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
    )
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.zip_with(
                    ws, shifted, lambda w, p: F.struct(w.alias("w"), p.alias("prev"))
                )
            ).alias("t"),
        )
        .select("doc_id", "t.w", "t.prev")
        # zip_with pads to the longer side: an empty word array zipped
        # with its [NULL] shifted head yields one (NULL, NULL) row — drop
        .where(F.col("w").isNotNull())
    )
    pw = _freq_with_total(toks, "w")
    bf = (
        toks.where(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count("*").alias("cnt2"))
    )
    scored = (
        toks.join(_model_side(pw, broadcast), "w")
        .join(
            _model_side(
                pw.select(F.col("w").alias("prev"), F.col("cnt").alias("cntp")),
                broadcast,
            ),
            "prev",
            "left",
        )
        .join(_model_side(bf, broadcast), ["prev", "w"], "left")
    )
    pu = F.col("cnt") / F.col("_n")
    p = F.when(
        F.col("prev").isNull(), pu
    ).otherwise(F.lit(lam) * (F.col("cnt2") / F.col("cntp")) + F.lit(1.0 - lam) * pu)
    return _bits_per_token(
        scored.select("doc_id", _micro_units(F.round(-F.log2(p), 6)).alias("_u"))
    )


def trigram_logloss(
    docs: DataFrame,
    lams: tuple[float, float, float] = (0.5, 0.3, 0.2),
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_words, bits_per_token): per-document cross-entropy under
    an INTERPOLATED TRIGRAM model trained on the corpus itself — the top
    tier of the KenLM-shaped quality ladder (unigram → bigram → trigram;
    Wenzek et al. 2020 bucket documents by 5-gram KenLM perplexity, and
    interpolated n-gram cross-entropy is the SQL-expressible analogue):

        p(wᵢ | wᵢ₋₂ wᵢ₋₁) = λ₃·c(wᵢ₋₂wᵢ₋₁wᵢ)/c(wᵢ₋₂wᵢ₋₁)
                           + λ₂·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) + λ₁·c(wᵢ)/N

    with λ₃+λ₂+λ₁ = 1. The first token is scored unigram-only and the
    second bigram-interpolated with the higher-order mass collapsed onto
    the bigram term (λ = λ₃+λ₂) — the standard open-vocabulary backoff
    at sentence starts. Trained on the scored corpus itself, every
    observed context has a nonzero count, so no smoothing floor is
    needed.

    Plan: the same O(L) shifted-zip pair build as the bigram tier, one
    more shift for wᵢ₋₂ (two nested zip_with — still no window, no
    doc-keyed exchange); one unigram + one bigram + one trigram groupBy;
    five broadcast joins score each token (w, prev, prev→w, context
    (prev2,prev), trigram). The trigram table is the largest broadcast —
    corpus-sparse (≤ total token count) but at an unbounded web corpus
    pass ``broadcast=False`` to swap every model-table broadcast for a
    shuffle join on its keys (:func:`_model_side`). Same 6-dp micro-unit
    discipline via the shared helpers."""
    l3, l2, l1 = lams
    lam_b = l3 + l2
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    s1 = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
    )
    s2 = F.concat(
        F.array(F.lit(None).cast("string"), F.lit(None).cast("string")),
        F.slice(ws, 1, F.greatest(F.size(ws) - 2, F.lit(0))),
    )
    t1 = F.zip_with(ws, s1, lambda w, p: F.struct(w.alias("w"), p.alias("prev")))
    t2 = F.zip_with(
        t1,
        s2,
        lambda t, p2: F.struct(
            t["w"].alias("w"), t["prev"].alias("prev"), p2.alias("prev2")
        ),
    )
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(t2).alias("t"))
        .select("doc_id", "t.w", "t.prev", "t.prev2")
        # zip_with pads to the longer side (s2 is 2 longer than a 0/1-word
        # array): padded rows surface as NULL w — drop, as in the bigram
        .where(F.col("w").isNotNull())
    )
    pw = _freq_with_total(toks, "w")
    bf = (
        toks.where(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count("*").alias("cnt2"))
    )
    tf = (
        toks.where(F.col("prev2").isNotNull())
        .groupBy("prev2", "prev", "w")
        .agg(F.count("*").alias("cnt3"))
    )
    ctx = bf.select(
        F.col("prev").alias("prev2"), F.col("w").alias("prev"), F.col("cnt2").alias("cntc")
    )
    scored = (
        toks.join(_model_side(pw, broadcast), "w")
        .join(
            _model_side(
                pw.select(F.col("w").alias("prev"), F.col("cnt").alias("cntp")),
                broadcast,
            ),
            "prev",
            "left",
        )
        .join(_model_side(bf, broadcast), ["prev", "w"], "left")
        .join(_model_side(ctx, broadcast), ["prev2", "prev"], "left")
        .join(_model_side(tf, broadcast), ["prev2", "prev", "w"], "left")
    )
    pu = F.col("cnt") / F.col("_n")
    p = (
        F.when(F.col("prev").isNull(), pu)
        .when(
            F.col("prev2").isNull(),
            F.lit(lam_b) * (F.col("cnt2") / F.col("cntp")) + F.lit(l1) * pu,
        )
        .otherwise(
            F.lit(l3) * (F.col("cnt3") / F.col("cntc"))
            + F.lit(l2) * (F.col("cnt2") / F.col("cntp"))
            + F.lit(l1) * pu
        )
    )
    return _bits_per_token(
        scored.select("doc_id", _micro_units(F.round(-F.log2(p), 6)).alias("_u"))
    )
