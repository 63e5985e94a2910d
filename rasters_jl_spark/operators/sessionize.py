"""sessionize — gap-based session windows over an event stream.

The temporal-series cousin of the reference's `slice`/`combine` series ops
(`src/series.jl`): instead of fixed calendar slices, events group into
SESSIONS — maximal runs where consecutive events per key are less than
``gap`` apart. This is the canonical web-analytics rollup (user sessions
over crawl/click events) and a first-class Structured Streaming citizen.

Spark shape: the NATIVE ``session_window`` aggregate — Catalyst merges
overlapping [ts, ts+gap) intervals inside a single groupBy with map-side
partial merging, so the exchange carries per-(key, merged-window) partial
rows, never raw events twice. At 100 TB this is one shuffle keyed by
(key, window), the minimum the semantics admit; the same expression runs
unchanged under ``readStream`` + watermark (streaming/ingest.py twin).

Sum determinism: ``value`` contributions are quantized to integer cents
BEFORE aggregation (the ppl-bucket discipline) so partial-agg order can
never perturb the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key session aggregates: start/end (end = last event + gap, the
    session_window convention), event count, duration seconds (first→last
    event), and the cent-quantized value sum.

    A new session starts when an event is STRICTLY more than gap after
    the previous one: session_window treats [ts, ts+gap] as mergeable at
    the boundary (an event at exactly prev+gap extends the session —
    verified empirically in tests), so the oracle's gaps-and-islands rule
    must use >.
    """
    w = F.session_window(F.col(ts_col), gap)
    agg = (
        events.withColumn("_cents", F.round(F.col(value_col) * 100).cast("long"))
        .groupBy(F.col(key_col), w.alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
            F.sum("_cents").alias("_sc"),
        )
    )
    return agg.select(
        key_col,
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        "n_events",
        # parquet event times are TIMESTAMP_NTZ; the session runs UTC
        # (session.py), so the ltz cast is the identity wall-clock mapping
        # and unix_micros equals the oracle's epoch_us over naive values
        (
            F.unix_micros(F.col("_last").cast("timestamp"))
            - F.unix_micros(F.col("_first").cast("timestamp"))
        ).alias("duration_us"),
        (F.col("_sc") / F.lit(100.0)).alias("sum_value"),
    )


def sessionize_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> str:
    """DuckDB gaps-and-islands twin of :func:`sessionize` — new session
    when ts - prev > gap (exact-boundary events merge, matching
    session_window)."""
    return f"""WITH e AS (
    SELECT {key_col}, {ts_col}, CAST(ROUND({value_col} * 100) AS BIGINT) AS cents,
           CASE WHEN LAG({ts_col}) OVER (PARTITION BY {key_col} ORDER BY {ts_col}) IS NULL
                     OR {ts_col} > LAG({ts_col}) OVER (PARTITION BY {key_col} ORDER BY {ts_col})
                       + INTERVAL {gap_minutes} MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM {table}
),
s AS (
    SELECT *, SUM(new_s) OVER (PARTITION BY {key_col} ORDER BY {ts_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM e
),
g AS (
    SELECT {key_col}, sid, MIN({ts_col}) AS session_start,
           MAX({ts_col}) + INTERVAL {gap_minutes} MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(epoch_us(MAX({ts_col})) - epoch_us(MIN({ts_col})) AS BIGINT)
               AS duration_us,
           CAST(SUM(cents) AS BIGINT) AS sc
    FROM s GROUP BY {key_col}, sid
)
SELECT {key_col}, session_start, session_end, n_events, duration_us,
       sc / 100.0 AS sum_value
FROM g"""
