"""PII detection & redaction — the scrubbing stage of a training-data
pipeline (emails / IPv4 addresses / phone numbers → typed placeholder
tokens). Reference scope: Rasters.jl has no text surface; this is
north-rule training-pipeline coverage alongside dedup/decontamination.

Engineering shape: pure codegen regexp expressions (regexp_count +
chained regexp_replace) — per-row compute, zero shuffle, no Python in
the row path. Patterns are deliberately restricted to the syntax subset
shared by Java regex (Spark) and RE2 (DuckDB): character classes, bounded
repetition, \\b word boundaries — no lookbehind, no backreferences — so
the SAME pattern text drives both engines and the oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied in order; earlier redactions
# cannot create later matches (placeholders contain no digits or '@')
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    # international +<7-15 digits> or NANP-style ddd-ddd-dddd
    ("phone", r"\+\d{7,15}\b|\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
)


def redact_col(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All input columns with ``text_col`` redacted, plus per-type match
    counts (n_email, n_ip, n_phone). Each count is taken on the text AS
    THE SEQUENTIAL REDACTION SEES IT (after the previous patterns'
    replacements) — counting every pattern on the original text would
    report matches an earlier redaction already consumed (e.g. a
    dotted-digit local part inside an address counted as an IP that no
    [IP] placeholder ever replaced), overstating per-type scrub volume."""
    counts = []
    cur = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    others = [c for c in docs.columns if c != text_col]
    return docs.select(*[F.col(c) for c in others], *counts, cur.alias(text_col))
