"""html→text main-content extraction edges (functions/html.py)."""

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.functions.html import html_text


def _one(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return html_text(df, "html", **kw).collect()[0]


def test_basic_boilerplate_removal(spark):
    r = _one(
        spark,
        "<html><head><title>T</title></head><body>"
        '<nav><a href="/">Home</a> <a href="/x">About</a></nav>'
        "<p>this is the real content of the page and it stays</p>"
        '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
        "</body></html>",
    )
    assert r["content"] == "this is the real content of the page and it stays"
    assert r["n_kept"] == 1


def test_script_style_comment_stripped(spark):
    r = _one(
        spark,
        "<body><script>document.write('<p>injected never seen</p>');</script>"
        "<style>p { color: red; } .x > span { display: none }</style>"
        "<!-- a comment with <p>fake tags</p> and --><p>only the visible words remain here</p></body>",
    )
    assert r["content"] == "only the visible words remain here"
    assert r["n_kept"] == 1


def test_anchor_text_counts_as_link_chars(spark):
    # block that is mostly link text -> dropped; mixed block -> kept
    r = _one(
        spark,
        '<p><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></p>'
        '<p>surrounding prose with a single <a href="/d">link</a> inside a long sentence</p>',
    )
    assert r["n_kept"] == 1
    assert r["content"].startswith("surrounding prose")


def test_entities_decoded_after_tag_strip(spark):
    r = _one(spark, "<p>fish &amp; chips &lt;not a tag&gt; &quot;quoted&quot; it&#39;s</p>")
    assert r["content"] == 'fish & chips <not a tag> "quoted" it\'s'


def test_nested_inline_tags_inside_anchor(spark):
    # <b> inside the anchor: its text is still link text
    r = _one(
        spark,
        '<p><a href="/x">click <b>here</b> now</a></p>'
        "<p>actual readable document body text continues</p>",
    )
    assert r["n_kept"] == 1
    assert r["content"] == "actual readable document body text continues"


def test_null_and_empty_and_tagless(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "bare text with no markup at all")],
        "id int, html string",
    )
    rows = {r["id"]: r for r in html_text(df, "html").collect()}
    assert rows[1]["content"] == "" and rows[1]["n_blocks"] == 0
    assert rows[2]["content"] == "" and rows[2]["n_kept"] == 0
    # no block tags: whole input is one block
    assert rows[3]["content"] == "bare text with no markup at all"
    assert rows[3]["n_blocks"] == 1


def test_min_words_and_stopword_gates(spark):
    html = "<p>tiny one</p><p>the words in this block are plainly prose</p>"
    r = _one(spark, html)
    assert r["content"] == "the words in this block are plainly prose"
    # stop-word gate on: the prose block passes (the/in/this/are), a
    # keyword-salad block does not
    html2 = "<p>alpha beta gamma delta epsilon zeta</p><p>the cat sat on the mat</p>"
    r2 = _one(spark, html2, min_stop_pct=20)
    assert r2["content"] == "the cat sat on the mat"


def test_crlf_and_whitespace_normalised(spark):
    r = _one(spark, "<p>line one\r\n   line\ttwo\n\nline three here</p>")
    assert r["content"] == "line one line two line three here"


def test_br_splits_blocks(spark):
    r = _one(spark, "first half of the sentence stays<br/>second half also fully kept here")
    assert r["n_blocks"] == 2
    assert r["content"] == "first half of the sentence stays\nsecond half also fully kept here"


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("x<p>a</p>",)], "html string")
    plan = html_text(df, "html")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
