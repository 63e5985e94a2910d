"""robots.txt parse + longest-match decision (functions/urls.py)."""

from pyspark.sql import functions as F

from rasters_jl_spark.functions.urls import (
    filter_robots,
    robots_allowed_col,
    robots_rules_col,
    url_path_col,
)


def _rules(spark, txt):
    df = spark.createDataFrame([(txt,)], "t string")
    return df.select(robots_rules_col(F.col("t")).alias("r")).collect()[0]["r"]


def test_wildcard_group_parse(spark):
    r = _rules(
        spark,
        "User-agent: gptbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nDisallow:\n",
    )
    assert [(x["prefix"], x["allow"]) for x in r] == [
        ("/private/", False),
        ("/private/ok", True),
    ]  # gptbot group ignored; empty Disallow dropped


def test_multiple_wildcard_groups_and_crlf(spark):
    r = _rules(
        spark,
        "User-agent: *\r\nDisallow: /a\r\n\r\nUser-agent: *\r\nAllow: /a/b\r\n",
    )
    assert [(x["prefix"], x["allow"]) for x in r] == [("/a", False), ("/a/b", True)]


def test_no_wildcard_group_or_null(spark):
    assert _rules(spark, "User-agent: gptbot\nDisallow: /\n") == []
    assert _rules(spark, None) == []


def _allowed(spark, path, rules_txt):
    df = spark.createDataFrame([(path, rules_txt)], "p string, t string")
    return df.select(
        robots_allowed_col(F.col("p"), robots_rules_col(F.col("t"))).alias("a")
    ).collect()[0]["a"]


def test_longest_match_allow_override(spark):
    txt = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nDisallow: /tmp\n"
    assert _allowed(spark, "/private/page", txt) is False
    assert _allowed(spark, "/private/ok/page", txt) is True   # longer allow wins
    assert _allowed(spark, "/tmp42", txt) is False             # bare prefix match
    assert _allowed(spark, "/public", txt) is True             # no match → allowed
    # equal-length tie → allow wins
    tie = "User-agent: *\nDisallow: /xy\nAllow: /xz\n"
    assert _allowed(spark, "/xz9", tie) is True


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [
            (1, "https://X.com/A/B?q=1"),
            (2, "http://x.com"),
            (3, "https://x.com/p#frag"),
        ],
        "id int, url string",
    )
    out = {r["id"]: r["p"] for r in df.select("id", url_path_col(F.col("url")).alias("p")).collect()}
    assert out[1] == "/a/b"  # lowercased, query stripped
    assert out[2] == "/"
    assert out[3] == "/p"


def test_filter_robots_broadcast_join(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/private/x"),
            (2, "https://a.com/ok"),
            (3, "https://norobots.com/anything"),
        ],
        "doc_id int, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    out = {r["doc_id"]: r["allowed"] for r in filter_robots(pages, robots).collect()}
    assert out == {1: False, 2: True, 3: True}
    plan = filter_robots(pages, robots)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
