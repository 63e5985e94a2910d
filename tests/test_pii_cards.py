"""Luhn-gated card redaction (functions/pii.py::redact_cards)."""

from pyspark.sql import functions as F

from rasters_jl_spark.functions.pii import redact_cards


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return {r["doc_id"]: r for r in redact_cards(df).collect()}


def test_valid_cards_redacted_invalid_untouched(spark):
    out = _run(
        spark,
        [
            "pay 4111 1111 1111 1111 now",          # valid Visa test PAN
            "ref 4111-1111-1111-1112 thanks",        # checksum fails
            "amex 378282246310005 works",            # valid 15-digit
            "mc 5555-5555-5555-4444!",               # valid with dashes
        ],
    )
    assert out[0]["n_card"] == 1 and out[0]["text"] == "pay [CARD] now"
    assert out[1]["n_card"] == 0 and "4111-1111-1111-1112" in out[1]["text"]
    assert out[2]["n_card"] == 1 and out[2]["text"] == "amex [CARD] works"
    assert out[3]["n_card"] == 1 and out[3]["text"] == "mc [CARD]!"


def test_length_gate(spark):
    # 12 digits Luhn-passes arithmetically but is below the 13-digit floor
    out = _run(spark, ["order 123456781234 id", "long 12345678901234567890123 x"])
    assert out[0]["n_card"] == 0 and "123456781234" in out[0]["text"]
    # 23 digits: regex itself caps at 19 digits, no match to validate
    assert out[1]["n_card"] == 0


def test_multiple_and_null(spark):
    out = _run(
        spark,
        ["a 4111 1111 1111 1111 b 378282246310005 c", None, ""],
    )
    assert out[0]["n_card"] == 2
    assert out[0]["text"] == "a [CARD] b [CARD] c"
    assert out[1]["n_card"] == 0 and out[1]["text"] == ""
    assert out[2]["n_card"] == 0 and out[2]["text"] == ""


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = redact_cards(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
