"""Streaming near-dup candidate maintenance — incremental MinHash LSH.

Batch dedup recomputes all buckets per run; on a continuously-ingesting
corpus the engine instead maintains LSH bucket membership as STREAM STATE
(`applyInPandasWithState`), so each arriving document only generates
candidate pairs against the documents already seen in its buckets:

    readStream docs
      → per-row band signatures (pure column math — minhash_sig_col has no
        aggregation, so it is stream-safe with no shuffle before the explode)
      → explode to (band, sig, doc_id)
      → groupBy(band, sig).applyInPandasWithState:
            state = sorted doc_ids seen in this bucket (+ saturation flag)
            emit new×old + new×new pairs; append new ids
      → foreachBatch append (band, sig, doc_a, doc_b)

State is O(bucket size) per key, capped at BUCKET_CAP: a saturated bucket
stops emitting (and stops growing) — the streaming analogue of the batch
cap, except the prefix of pairs emitted before saturation is kept (batch
drops the whole bucket; on an un-saturated corpus the two agree exactly,
which the registry oracle enforces).

Equivalence: over the same corpus, the union of emitted pairs (distinct,
across any micro-batch split) equals the batch LSH candidate set —
asserted by `tests/test_streaming_lineage.py` with a 2-micro-batch split
and by the `stream_dedup_pairs` registry oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from rasters_jl_spark.functions.dedup import BUCKET_CAP, MINHASH_BANDS, minhash_sig_col

PAIRS_SCHEMA = "band int, sig string, doc_a long, doc_b long"
STATE_SCHEMA = "ids array<bigint>, saturated boolean"


def band_rows_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band, sig) with signatures computed per-row (array_min over
    the shingle transform — the same salted-md5 family as batch, no agg)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        minhash_sig_col(F.col(text_col), b).alias("sig"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def _bucket_update(key, pdfs, state: GroupState):
    """Per-(band, sig) state update: emit pairs of new docs against the
    bucket's remembered membership, then remember the new docs."""
    if state.exists:
        ids, saturated = state.get
        ids = list(ids)
    else:
        ids, saturated = [], False
    new = set()
    for pdf in pdfs:
        new.update(int(x) for x in pdf["doc_id"])
    new = sorted(new.difference(ids))
    out_a, out_b = [], []
    if not saturated:
        for i, d in enumerate(new):
            if len(ids) + i >= BUCKET_CAP:
                saturated = True
                break
            for old in ids:
                lo, hi = (old, d) if old < d else (d, old)
                out_a.append(lo)
                out_b.append(hi)
            for prev in new[:i]:
                lo, hi = (prev, d) if prev < d else (d, prev)
                out_a.append(lo)
                out_b.append(hi)
        keep = new if not saturated else new[: max(0, BUCKET_CAP - len(ids))]
        ids = sorted(ids + keep)
    state.update((ids, saturated))
    yield pd.DataFrame(
        {
            "band": pd.array([int(key[0])] * len(out_a), dtype="int32"),
            "sig": [str(key[1])] * len(out_a),
            "doc_a": out_a,
            "doc_b": out_b,
        }
    )


def candidate_pairs_stream(band_rows: DataFrame) -> DataFrame:
    """Stateful candidate-pair stream from (doc_id, band, sig) rows."""
    return band_rows.groupBy("band", "sig").applyInPandasWithState(
        _bucket_update,
        outputStructType=PAIRS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Launch the incremental dedup stream (availableNow drain); returns
    the StreamingQuery. ``max_files_per_trigger=1`` forces one micro-batch
    per input file — the test harness uses it to prove state persistence
    across batches."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir).select("doc_id", "text")
    pairs = candidate_pairs_stream(band_rows_stream(docs))

    def _write_batch(batch_df: DataFrame, batch_id: int):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    return (
        pairs.writeStream.outputMode("update")
        .foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
