"""Cluster job: checkpoint-resumable streaming ingest of page drops.

    spark-submit --py-files dist/rasters_jl_spark.zip jobs/ingest_job.py \
        --in <landing dir of page parquet drops> --out <agg output dir> \
        --checkpoint <checkpoint dir> [--window "10 minutes"]

Structured Streaming with trigger=availableNow: each invocation drains
whatever new files landed since the last run, then exits — the cron-batch
pattern for continuous ingest. Resume is Spark's own streaming checkpoint
(file-source offsets + window state live in --checkpoint): re-running
after a kill processes only unseen files, and replays are idempotent
because cell assignment is deterministic column math.

Output: tumbling-window per-tile (window, tile_id, n_pages, sum_chars,
batch_id) rows appended per micro-batch. Update-mode semantics: when a
later drop touches an existing (window, tile) key its CUMULATIVE aggregate
is re-emitted under the new batch_id — consumers read the row with the max
batch_id per key (the usual update-stream-to-append-sink compaction).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="input_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--window", default="10 minutes")
    ap.add_argument(
        "--schema",
        default="doc_id long, text string, lang string, source string, n_chars long",
        help=(
            "DDL schema of the incoming page files (driver documents shape by"
            " default; include warc_ts timestamp when the feed carries one —"
            " absent, a deterministic ingest timestamp is synthesized)"
        ),
    )
    ap.add_argument("--timeout-s", type=int, default=600)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("rasters_jl_spark.ingest").getOrCreate()

    from rasters_jl_spark.streaming.ingest import start_ingest

    q = start_ingest(
        spark,
        args.input_dir,
        args.schema,
        args.out,
        args.checkpoint,
        window=args.window,
    )
    finished = q.awaitTermination(args.timeout_s)
    if not finished:
        q.stop()
        raise SystemExit(f"ingest did not drain within {args.timeout_s}s")
    print(f"ingest drained: progress batches = {len(q.recentProgress)}")
    spark.stop()


if __name__ == "__main__":
    main()
