"""Gap-session semantics: batch session_window vs the gaps-and-islands rule,
and the streaming state twin (operators/sessionize.py, streaming/
session_stream.py)."""

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.operators.sessionize import sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), v) for u, m, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_exact_gap_boundary_merges(spark):
    """session_window merges at the exact boundary: an event at exactly
    prev + gap EXTENDS the session; one microsecond past it splits (the
    oracle's strict-> rule)."""
    df = _ev(spark, [(1, 0, 1.0), (1, 30, 2.0), (1, 59, 3.0)])
    out = sessionize(df).collect()
    assert len(out) == 1 and out[0]["n_events"] == 3
    df2 = spark.createDataFrame(
        [
            (1, T0, 1.0),
            (1, T0 + dt.timedelta(minutes=30, microseconds=1), 2.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out2 = sessionize(df2).collect()
    assert sorted(r["n_events"] for r in out2) == [1, 1]


def test_session_fields_golden(spark):
    df = _ev(spark, [(7, 0, 1.25), (7, 10, 2.50), (7, 100, 4.00), (8, 5, 0.10)])
    rows = {
        (r["user_id"], r["session_start"]): r for r in sessionize(df).collect()
    }
    s1 = rows[(7, T0)]
    assert s1["n_events"] == 2
    assert s1["session_end"] == T0 + dt.timedelta(minutes=40)  # last + gap
    assert s1["duration_us"] == 10 * 60 * 1_000_000
    assert s1["sum_value"] == pytest.approx(3.75)
    s2 = rows[(7, T0 + dt.timedelta(minutes=100))]
    assert s2["n_events"] == 1 and s2["duration_us"] == 0
    assert rows[(8, T0 + dt.timedelta(minutes=5))]["sum_value"] == pytest.approx(0.10)


def test_single_shuffle_plan(spark):
    df = _ev(spark, [(1, 0, 1.0)])
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # session-window agg may repartition once per phase
    assert "SortMergeJoin" not in plan and "BatchEvalPython" not in plan


def test_stream_sessions_matches_batch(spark):
    """Two time-split micro-batches + a sentinel batch: the emitted union
    equals batch sessionize over the real events; sentinel sessions are
    never emitted; state carries an open session ACROSS the batch cut."""
    from rasters_jl_spark.streaming.session_stream import start_session_stream

    rows = [
        (1, 0, 1.0), (1, 20, 2.0),      # session A: spans the batch cut
        (1, 90, 3.0),                    # session B
        (2, 10, 5.0), (2, 200, 6.0),     # two singleton sessions
        (3, 55, 7.0),                    # entirely in batch 2
    ]
    ev = _ev(spark, rows)
    base = tempfile.mkdtemp(prefix="t_sess_")
    src, out, ck = f"{base}/src", f"{base}/out", f"{base}/ck"
    cut = T0 + dt.timedelta(minutes=25)  # splits session A's events? no: A=[0,20] both < 25
    ev.where(F.col("ts") < F.lit(cut)).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("ts") >= F.lit(cut)).coalesce(1).write.mode("append").parquet(src)
    # sentinel tick per user far past everything
    ev.select("user_id").distinct().select(
        "user_id",
        F.lit(T0 + dt.timedelta(minutes=500)).alias("ts"),
        F.lit(0.0).alias("value"),
    ).coalesce(1).write.mode("append").parquet(src)

    q = start_session_stream(
        spark, src, "user_id long, ts timestamp, value double", out, ck
    )
    assert q.awaitTermination(600)
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["duration_us"], r["sum_value"]
        )
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["duration_us"], r["sum_value"]
        )
        for r in sessionize(ev).collect()
    }
    assert got == want
    assert len(got) == 5  # u1: 2 sessions, u2: 2 singletons, u3: 1


def test_stream_open_session_spans_cut(spark):
    """An open session whose events straddle the micro-batch boundary is
    merged by state, not split (the cross-batch correctness claim)."""
    from rasters_jl_spark.streaming.session_stream import start_session_stream

    rows = [(9, 0, 1.0), (9, 20, 1.0), (9, 40, 1.0)]  # one session, 3 events
    ev = _ev(spark, rows)
    base = tempfile.mkdtemp(prefix="t_sess_cut_")
    src, out, ck = f"{base}/src", f"{base}/out", f"{base}/ck"
    cut = T0 + dt.timedelta(minutes=30)  # 2 events | 1 event
    ev.where(F.col("ts") < F.lit(cut)).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("ts") >= F.lit(cut)).coalesce(1).write.mode("append").parquet(src)
    ev.select("user_id").distinct().select(
        "user_id",
        F.lit(T0 + dt.timedelta(minutes=500)).alias("ts"),
        F.lit(0.0).alias("value"),
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_session_stream(
        spark, src, "user_id long, ts timestamp, value double", out, ck
    )
    assert q.awaitTermination(600)
    res = spark.read.parquet(out).collect()
    assert len(res) == 1
    assert res[0]["n_events"] == 3
    assert res[0]["duration_us"] == 40 * 60 * 1_000_000
