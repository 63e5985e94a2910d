"""Streaming sessionization — gap-closed sessions as STREAM STATE.

The streaming twin of `operators/sessionize.py`: per-key open sessions are
carried in the state store; a session CLOSES (and is emitted) when a later
event arrives MORE than gap after the session's last event (exact-
boundary events merge), exactly the batch
``session_window`` merge rule. State is O(1) per key (4 scalars), so the
store is key-count-sized at any event volume — the same bounded-state
argument as `zonal_stream.py`.

Emission contract: closed sessions only (append semantics — each session
row is emitted exactly once, when the event proving the gap arrives).
The still-open tail session per key lives in state; production deployments
flush it by clock timeout (GroupStateTimeout) or a sentinel tick — the
registry fixture uses per-key sentinel events, which close every real
session without themselves being emitted. Cross-batch correctness assumes
micro-batches arrive in event-time order per key (file-source fixtures
split at a time cutoff; a real deployment pairs this with a watermark +
source ordering, or uses the native ``session_window`` aggregate when
append-on-watermark latency is acceptable).

Why not ``session_window`` + watermark here: with an availableNow drain
the final watermark never passes the last open window, so batch parity
needs a flush convention anyway — the explicit state fold makes that
convention testable and keeps per-batch emission deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# raw micros from the state fold; converted to timestamps JVM-side in
# sessions_stream (timestamp_micros) so pandas naive-datetime timezone
# semantics never touch the values
_RAW_SCHEMA = (
    "user_id long, start_us long, end_us long, "
    "n_events long, duration_us long, sum_value double"
)
# open session: first/last event micros, event count, cent-quantized sum
_STATE_SCHEMA = "first_us bigint, last_us bigint, n bigint, cents bigint"

_GAP_US_DEFAULT = 30 * 60 * 1_000_000


def _make_session_update(gap_us: int):
    def _update(key, pdfs, state: GroupState):
        if state.exists:
            first_us, last_us, n, cents = state.get
        else:
            first_us = None
            last_us = n = cents = 0
        out = []

        def close():
            out.append(
                (
                    int(key[0]),
                    int(first_us),
                    int(last_us + gap_us),
                    int(n),
                    int(last_us - first_us),
                    cents / 100.0,
                )
            )

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("_ts_us")
            for ts_us, c in zip(pdf["_ts_us"], pdf["_cents"]):
                ts_us, c = int(ts_us), int(c)
                if first_us is None:
                    first_us, last_us, n, cents = ts_us, ts_us, 1, c
                elif ts_us - last_us > gap_us:
                    close()
                    first_us, last_us, n, cents = ts_us, ts_us, 1, c
                else:
                    last_us, n, cents = ts_us, n + 1, cents + c
        if first_us is not None:
            state.update((first_us, last_us, n, cents))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "start_us",
                    "end_us",
                    "n_events",
                    "duration_us",
                    "sum_value",
                ],
            )

    return _update


def sessions_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_us: int = _GAP_US_DEFAULT,
) -> DataFrame:
    """Closed-session stream from a (streaming) events DataFrame. The only
    shuffle is the groupBy(key) into the state operator; per-row prep
    (micros + cent quantization) is stream-safe column math."""
    prep = events.select(
        F.col(key_col).cast("long").alias(key_col),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    raw = prep.groupBy(key_col).applyInPandasWithState(
        _make_session_update(gap_us),
        outputStructType=_RAW_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return raw.select(
        key_col,
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        "n_events",
        "duration_us",
        "sum_value",
    )


def start_session_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    gap_us: int = _GAP_US_DEFAULT,
    max_files_per_trigger: int | None = 1,
):
    """Launch the sessionization stream (availableNow drain); returns the
    StreamingQuery. One micro-batch per input file when
    ``max_files_per_trigger=1`` (the state-persistence fixture shape)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir)
    sess = sessions_stream(events, gap_us=gap_us)

    def _write_batch(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("append").parquet(out_dir)

    return (
        sess.writeStream.outputMode("append")
        .foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
