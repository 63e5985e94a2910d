"""asof_join per-left-row semantics (Ti=Near/At direction selectors)."""

from rasters_jl_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 100), ("u2", 100), ("u3", 100)], "user_id string, t long"
    )
    right = spark.createDataFrame(
        [
            ("u1", 90, "a"),   # matches backward
            ("u1", 95, "b"),   # latest backward match
            ("u1", 110, "c"),
            ("u2", 120, "d"),  # key matches, but only FUTURE rows
            # u3: no right rows at all
        ],
        "user_id string, t long, tag string",
    )
    return left, right


def test_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {r["user_id"]: (r["_rts"], r["tag"]) for r in
           asof_join(left, right, "t", "t", ["user_id"], "backward").collect()}
    assert out["u1"] == (95, "b")


def test_backward_keeps_left_row_when_only_future_matches(spark):
    """Key matches right rows but none satisfies the direction predicate —
    the left row must survive with NULL right columns, not be dropped."""
    left, right = _frames(spark)
    res = asof_join(left, right, "t", "t", ["user_id"], "backward")
    out = {r["user_id"]: (r["_rts"], r["tag"]) for r in res.collect()}
    assert set(out) == {"u1", "u2", "u3"}
    assert out["u2"] == (None, None)
    assert out["u3"] == (None, None)


def test_forward_direction(spark):
    left, right = _frames(spark)
    res = asof_join(left, right, "t", "t", ["user_id"], "forward")
    out = {r["user_id"]: (r["_rts"], r["tag"]) for r in res.collect()}
    assert out["u1"] == (110, "c")
    assert out["u2"] == (120, "d")
    assert out["u3"] == (None, None)


def test_duplicate_left_timestamps_both_survive(spark):
    """Two distinct left rows sharing (key, ts) but differing payload must
    BOTH appear in the output (the window partitions by left row id, not by
    (key, ts))."""
    left = spark.createDataFrame(
        [("u1", 100, "p"), ("u1", 100, "q")], "user_id string, t long, payload string"
    )
    right = spark.createDataFrame([("u1", 90, "a")], "user_id string, t long, tag string")
    rows = asof_join(left, right, "t", "t", ["user_id"], "backward").collect()
    assert len(rows) == 2
    assert sorted(r["payload"] for r in rows) == ["p", "q"]
    assert all(r["tag"] == "a" for r in rows)


def test_fully_identical_left_rows_keep_multiplicity(spark):
    """Two byte-identical left rows are interchangeable but must BOTH
    appear (the deterministic dedupe-count-re-expand form preserves the
    multiset; monotonically_increasing_id would too, but nondeterministically
    under recompute)."""
    left = spark.createDataFrame(
        [("u1", 100), ("u1", 100), ("u1", 100)], "user_id string, t long"
    )
    right = spark.createDataFrame(
        [("u1", 90, "a"), ("u1", 95, "b")], "user_id string, t long, tag string"
    )
    rows = asof_join(left, right, "t", "t", ["user_id"], "backward").collect()
    assert len(rows) == 3
    assert all((r["_rts"], r["tag"]) == (95, "b") for r in rows)
