"""HTML main-content extraction — the crawl pipeline's html→text stage.

Block-classification boilerplate removal in the jusText/trafilatura family
(Pomikálek 2011 "Removing boilerplate and duplicate content from web
corpora" §4; C4 builds on the same link-density idea): split the page into
blocks at block-level tags, score each block by link density, word count
and stop-word density, keep content-like blocks, join with newlines.

Spark shape: ONE zero-shuffle codegen projection. The whole chain —
script/style/comment removal, block split, per-block tag-strip + entity
decode + feature counts, the keep rule, and the re-join — is Catalyst
expressions (`regexp_replace`/`split`/`transform`/`filter`/`array_join`);
no Python touches a row. The classify thresholds are INTEGER math
(``link_chars*100 <= text_chars*max_link_pct``) so the operator is
FP-free and its DuckDB oracle hashes bit-identically.

Scale: map-only — boilerplate removal over 100 TB of crawl HTML is
exactly as parallel as the scan; Catalyst pushes column pruning to the
parquet reader so only the html column is read.

Every regex below is in the RE2-compatible subset (no backreferences,
inline ``(?is)`` flags) so the Java-regex Spark side and the RE2 DuckDB
side execute the SAME pattern strings — the twin generators share these
constants, preventing drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared pattern / constant tables (Spark AND oracle) -----------------

RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
RE_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
RE_COMMENT = r"(?s)<!--.*?-->"
# block-level elements whose tags delimit text blocks (open or close);
# head/title/html/body included: their content forms its own block and the
# word-count gate drops chrome like <title> naturally.
RE_BLOCK = (
    r"(?is)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th"
    r"|section|article|header|footer|nav|aside|blockquote|pre|form|fieldset"
    r"|figure|figcaption|main|body|html|head|title|br|hr)\b[^>]*>"
)
RE_ANCHOR = r"(?is)<a\b[^>]*>.*?</a\s*>"
RE_TAG = r"(?s)<[^>]*>"
RE_WS = r"\s+"

# decode AFTER tag stripping (so &lt; can never create a fake tag);
# &amp; last, per the usual two-pass entity rule.
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be",
]

DEFAULT_MIN_WORDS = 3
DEFAULT_MAX_LINK_PCT = 33  # keep iff link_chars*100 <= text_chars*33
DEFAULT_MIN_STOP_PCT = 0   # stop-word gate off by default (non-prose corpora)


# --- Spark side -----------------------------------------------------------


def _strip_noise_col(html: Column) -> Column:
    c = F.regexp_replace(html, RE_SCRIPT, " ")
    c = F.regexp_replace(c, RE_STYLE, " ")
    return F.regexp_replace(c, RE_COMMENT, " ")


def _text_of(col: Column) -> Column:
    """tag-strip → entity-decode → whitespace-normalise."""
    t = F.regexp_replace(col, RE_TAG, " ")
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, RE_WS, " "))


def html_blocks_col(html: Column) -> Column:
    """array<struct<txt,tc,lc,wc,sc>> — one element per text block with its
    normalised text and the four integer classify features (text chars,
    link chars, word count, stop-word count). Block delimiter is \\x1e
    (record separator — cannot occur in text), NOT newline: literal
    newlines in HTML are insignificant whitespace, not block breaks."""
    blocks = F.split(F.regexp_replace(_strip_noise_col(html), RE_BLOCK, "\x1e"), "\x1e")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])

    def feats(b: Column) -> Column:
        t_all = _text_of(b)
        t_noa = _text_of(F.regexp_replace(b, RE_ANCHOR, " "))
        words = F.when(t_all == "", F.array().cast("array<string>")).otherwise(
            F.split(t_all, " ")
        )
        return F.struct(
            t_all.alias("txt"),
            F.length(t_all).alias("tc"),
            (F.length(t_all) - F.length(t_noa)).alias("lc"),
            F.size(words).alias("wc"),
            F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))).alias("sc"),
        )

    return F.transform(blocks, feats)


def _keep_col(
    b: Column, min_words: int, max_link_pct: int, min_stop_pct: int
) -> Column:
    return (
        (b["wc"] >= F.lit(min_words))
        & (b["lc"] * F.lit(100) <= b["tc"] * F.lit(max_link_pct))
        & (b["sc"] * F.lit(100) >= b["wc"] * F.lit(min_stop_pct))
    )


def html_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "content",
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_pct: int = DEFAULT_MAX_LINK_PCT,
    min_stop_pct: int = DEFAULT_MIN_STOP_PCT,
) -> DataFrame:
    """Append ``out_col`` (extracted main text), ``n_blocks`` (non-empty
    text blocks) and ``n_kept`` (blocks classified as content). NULL html
    → empty content, zero counts."""
    bl = html_blocks_col(F.coalesce(F.col(html_col), F.lit("")))
    kept = F.filter(bl, lambda b: _keep_col(b, min_words, max_link_pct, min_stop_pct))
    return (
        df.withColumn("_bl", bl)
        .withColumn(
            "n_blocks", F.size(F.filter(F.col("_bl"), lambda b: b["wc"] > 0))
        )
        .withColumn("_kept", kept)
        .withColumn("n_kept", F.size("_kept"))
        .withColumn(out_col, F.array_join(F.transform("_kept", lambda b: b["txt"]), "\n"))
        .drop("_bl", "_kept")
    )


# --- DuckDB oracle twin ---------------------------------------------------


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def _text_of_sql(expr: str) -> str:
    t = f"regexp_replace({expr}, {_sql_quote(RE_TAG)}, ' ', 'g')"
    for ent, rep in ENTITIES:
        t = f"replace({t}, {_sql_quote(ent)}, {_sql_quote(rep)})"
    return f"trim(regexp_replace({t}, {_sql_quote(RE_WS)}, ' ', 'g'))"


def html_blocks_sql(expr: str) -> str:
    """DuckDB expression mirroring :func:`html_blocks_col` (same pattern
    constants; list lambdas instead of Catalyst higher-order functions)."""
    noise = (
        f"regexp_replace(regexp_replace(regexp_replace({expr}, "
        f"{_sql_quote(RE_SCRIPT)}, ' ', 'g'), "
        f"{_sql_quote(RE_STYLE)}, ' ', 'g'), "
        f"{_sql_quote(RE_COMMENT)}, ' ', 'g')"
    )
    blocks = f"string_split(regexp_replace({noise}, {_sql_quote(RE_BLOCK)}, chr(30), 'g'), chr(30))"
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    t_all = _text_of_sql("b")
    t_noa = _text_of_sql(f"regexp_replace(b, {_sql_quote(RE_ANCHOR)}, ' ', 'g')")
    words = f"CASE WHEN {t_all} = '' THEN [] ELSE string_split({t_all}, ' ') END"
    return (
        f"list_transform({blocks}, b -> struct_pack("
        f"txt := {t_all}, "
        f"tc := CAST(len({t_all}) AS INT), "
        f"lc := CAST(len({t_all}) - len({t_noa}) AS INT), "
        f"wc := CAST(len({words}) AS INT), "
        f"sc := CAST(len(list_filter({words}, w -> list_contains({stop_list}, lower(w)))) AS INT)))"
    )


def html_text_sql(
    expr: str,
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_pct: int = DEFAULT_MAX_LINK_PCT,
    min_stop_pct: int = DEFAULT_MIN_STOP_PCT,
) -> dict[str, str]:
    """SELECT-list fragments {content, n_blocks, n_kept} over a column
    ``bl`` that must be bound to :func:`html_blocks_sql` output."""
    keep = (
        f"b.wc >= {min_words} AND b.lc * 100 <= b.tc * {max_link_pct} "
        f"AND b.sc * 100 >= b.wc * {min_stop_pct}"
    )
    return {
        "bl_expr": html_blocks_sql(f"COALESCE({expr}, '')"),
        "n_blocks": "CAST(len(list_filter(bl, b -> b.wc > 0)) AS INT)",
        "n_kept": f"CAST(len(list_filter(bl, b -> {keep})) AS INT)",
        "content": (
            f"COALESCE(array_to_string(list_transform("
            f"list_filter(bl, b -> {keep}), b -> b.txt), chr(10)), '')"
        ),
    }


# --- link extraction (feeds the host link graph / PageRank tier) ----------

RE_HREF = r"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"']+)["']"""


def extract_links_col(html: Column) -> Column:
    """array<string> of raw href values from anchor tags (group 1 of
    RE_HREF — RE2-subset, shared verbatim with the SQL twin)."""
    return F.regexp_extract_all(F.coalesce(html, F.lit("")), F.lit(RE_HREF), F.lit(1))


def extract_links_sql(expr: str) -> str:
    pat = RE_HREF.replace("'", "''")
    return f"regexp_extract_all(COALESCE({expr}, ''), '{pat}', 1)"
