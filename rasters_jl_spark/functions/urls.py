"""URL canonicalization & URL-level dedup — the first dedup pass of a web
crawl pipeline (the same page is fetched as `HTTP://Host:80/a/?utm=x#f`
and `http://host/a`): scheme/host lowercased, default ports stripped,
fragments dropped, tracking parameters removed, query parameters SORTED,
trailing path slashes trimmed. Reference scope: none (Rasters.jl);
north-rule training-pipeline coverage.

Engineering shape: regexp extraction + array sort/filter/join — all
codegen, per-row, zero shuffle; the dedup itself is one hash groupBy on
the canonical string (same plan class as exact text dedup). Patterns use
the Java-regex ∩ RE2 subset so the same pattern text drives Spark and
the DuckDB oracle (replacement syntax differs — $1 vs \\1 — so the
oracle builds its own replacement strings around identical patterns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 'ref' is deliberately NOT in the default list: unlike utm_*/fbclid/gclid
# it is a semantic parameter on many sites (branch refs, referral codes
# that change the served page) — callers curating a corpus where ref= is
# known tracking pass their own pattern
TRACKING_RE = "^(utm_[A-Za-z]+|fbclid|gclid)="
HEAD_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
# default ports are scheme-specific: :80 is default ONLY for http and
# :443 ONLY for https — http://host:443 and https://host:80 are genuinely
# distinct origins and must NOT collapse. The authority part is matched
# greedily (.*) rather than [^:]* so userinfo (user:pw@host:80) and
# bracketed IPv6 hosts ([2001:db8::1]:80) keep stripping their default
# port; the trailing ':' anchors the match, so :8080/:1443 never strip.
PORT_HTTP_RE = "^(http://.*):80$"
PORT_HTTPS_RE = "^(https://.*):443$"


def canonical_url_col(url: Column, tracking_re: str = TRACKING_RE) -> Column:
    """The canonical form of ``url`` (see module docstring for rules).
    ``tracking_re`` overrides the default tracking-parameter pattern."""
    u = F.regexp_replace(url, "#.*$", "")  # fragment
    head0 = F.regexp_extract(u, HEAD_RE, 0)
    head = F.regexp_replace(
        F.regexp_replace(F.lower(head0), PORT_HTTP_RE, "$1"), PORT_HTTPS_RE, "$1"
    )
    rest = u.substr(F.length(head0) + F.lit(1), F.length(u))
    path = F.regexp_replace(F.regexp_extract(rest, "^[^?]*", 0), "/+$", "")
    q = F.regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(tracking_re),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head, path, F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    )


def dedup_urls(pages: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(url_canon, n_urls, keep_id): one row per canonical URL with the
    variant count and the kept representative (min id — deterministic).
    One groupBy shuffle on the canonical hash; 100-TB shape identical to
    exact text dedup."""
    c = pages.select(F.col(id_col).alias("_id"), canonical_url_col(F.col(url_col)).alias("url_canon"))
    return c.groupBy("url_canon").agg(
        F.count("*").alias("n_urls"), F.min("_id").alias("keep_id")
    )


def host_col(url: Column) -> Column:
    """Registrable host of ``url``, lowercased, port stripped — the
    grouping key for domain-level curation (per-domain quality cuts,
    crawl budgets, licensing blocklists)."""
    h = F.lower(F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    return F.regexp_replace(h, ":\\d+$", "")


def domain_stats(
    pages: DataFrame, url_col: str = "url", chars_col: str = "n_chars"
) -> DataFrame:
    """(host, n_docs, sum_chars, avg_chars): per-domain corpus statistics —
    one partial-aggregated groupBy on the extracted host. At 100 TB this
    is the table a domain-filtering pass joins back against (broadcast:
    the web has ~10^8 hosts, a metadata-scale dimension)."""
    return (
        pages.select(host_col(F.col(url_col)).alias("host"), F.col(chars_col))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(chars_col).cast("long").alias("sum_chars"),
            F.round(F.avg(chars_col), 6).alias("avg_chars"),
        )
    )


def host_suffix_chain(host: Column) -> Column:
    """The label-suffix chain of a host: ``a.b.c`` → ``[a.b.c, b.c, c]``.
    Bounded by the label count (≤ ~6 on real hosts) — the explode side of
    the subdomain-aware blocklist join."""
    labels = F.split(host, "\\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def blocked_domains(
    pages: DataFrame, blocklist, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, host, matched): documents whose URL host equals a blocklist
    entry or is a subdomain of one (``host == e`` or ``host`` ends with
    ``'.' + e``) — the domain-blocklist gate every crawl pipeline runs
    before content filters (C4's badwords-domain cut; CCNet's per-domain
    curation). ``matched`` is the lexicographically smallest matching
    entry (deterministic when several nest).

    Scale shape: the host's label-suffix chain is exploded (≤ label-count
    rows per doc) and broadcast-semi-joined against the blocklist — never
    a per-pattern LIKE/regex scan, which is O(corpus × |blocklist|) work
    Catalyst can't index. Matching is label-anchored by construction
    (``xads.tracker.net`` does NOT match ``ads.tracker.net``; a plain
    string-suffix test would). The blocklist is metadata-scale (10⁶
    entries broadcast in MBs); the groupBy exchange carries ≤ 1 row per
    blocked doc after map-side partial aggregation."""
    spark = pages.sparkSession
    bl = spark.createDataFrame([(e,) for e in sorted(set(blocklist))], "entry string")
    hosts = pages.select(
        F.col(id_col).alias("doc_id"), host_col(F.col(url_col)).alias("host")
    )
    suff = hosts.select(
        "doc_id", "host", F.explode(host_suffix_chain(F.col("host"))).alias("entry")
    )
    return (
        suff.join(F.broadcast(bl), "entry")
        .groupBy("doc_id", "host")
        .agg(F.min("entry").alias("matched"))
    )
