"""Cluster job: raw-crawl → curated-text front end.

    spark-submit --py-files dist/rasters_jl_spark.zip jobs/crawl_job.py \
        --warc <dir or glob of .warc/.wet(.gz)> --out <output dir> \
        [--robots <parquet with (host, robots_txt)>] [--html] \
        [--min-words 20] [--synth N]

The stage every pretraining corpus starts with, chained from the engine's
individually-oracled operators — the raw-bytes front end whose OUTPUT is
what `jobs/pipeline_job.py` consumes:

    ingest    WARC/WET container split (one task per shard;
              per-record error routing)                    sources/warc.py
    robots    optional politeness gate: broadcast wildcard-
              group parse, longest-match codegen decision   functions/urls.py
    extract   --html: jusText-family block-classifier
              main-content extraction (pure codegen);
              otherwise records are WET (already text)      functions/html.py
    gate      word-count floor on the extracted content     (pure codegen)
    urldedup  canonical-URL keep-min dedup                  functions/urls.py
    exact     canonical-text exact dedup (CCNet normalize)  functions/dedup.py

Outputs under --out: ``corpus`` (url, host, path, content, n_words) and
``metrics`` (one row of per-stage counts + wall). ``--synth N`` first
writes N deterministic synthetic shards under <out>/_synth and ingests
those — the no-external-data demo mode.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc")
    ap.add_argument("--out", required=True)
    ap.add_argument("--robots")
    ap.add_argument("--html", action="store_true")
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--synth", type=int, default=0)
    args = ap.parse_args()

    from rasters_jl_spark.functions.dedup import canonical_text_col
    from rasters_jl_spark.functions.html import html_text
    from rasters_jl_spark.functions.urls import (
        canonical_url_col,
        filter_robots,
        host_col,
    )
    from rasters_jl_spark.session import get_spark
    from rasters_jl_spark.sources.warc import read_warc, synth_warc

    spark = get_spark(app_name="crawl_job")
    t0 = time.time()

    warc_path = args.warc
    if args.synth:
        # the last quarter of ids repeats earlier texts (exact-dedup prey);
        # every 17th page is a two-word stub (word-count-gate prey)
        base_id = F.col("id") % (3 * args.synth // 4)
        docs = spark.range(args.synth).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 17 == 0, F.lit("too short"))
            .otherwise(
                F.concat(
                    F.lit("the quick brown fox page "),
                    base_id.cast("string"),
                    F.lit(" with enough words to pass the gate " * 3),
                )
            )
            .alias("text"),
        )
        shards = synth_warc(docs, per_file=64, limit=args.synth)
        # demo-mode only: shard count is bounded (N/64), so a driver loop
        # writing the container bytes is fine here; real inputs arrive as
        # files and production re-sharding goes through write_warc
        import os

        os.makedirs(f"{args.out}/_synth", exist_ok=True)
        for r in shards.collect():
            name = str(r["file_id"]).replace("/", "_")
            with open(f"{args.out}/_synth/shard{name}.warc", "wb") as f:
                f.write(bytes(r["payload"]))
        warc_path = f"{args.out}/_synth"
        if not args.robots:
            # demo robots: block the /doc/13* prefix on the synth host
            spark.createDataFrame(
                [("crawl.example", "User-agent: *\nDisallow: /doc/13\n")],
                "host string, robots_txt string",
            ).write.mode("overwrite").parquet(f"{args.out}/_robots")
            args.robots = f"{args.out}/_robots"
    if not warc_path:
        raise SystemExit("--warc or --synth required")

    recs = read_warc(spark, warc_path)
    n_records = recs.count()
    pages = recs.where(F.col("rec_type") != "error").select(
        F.coalesce(F.col("target_uri"), F.lit("")).alias("url"),
        F.coalesce(F.col("text"), F.lit("")).alias("raw"),
    )
    n_ok = pages.count()

    if args.robots:
        robots = spark.read.parquet(args.robots)
        pages = (
            filter_robots(pages, robots)
            .where(F.col("allowed"))
            .select("url", "raw", "host", "path")
        )
    else:
        from rasters_jl_spark.functions.urls import url_path_col

        pages = pages.select(
            "url", "raw", host_col(F.col("url")).alias("host"),
            url_path_col(F.col("url")).alias("path"),
        )
    n_polite = pages.count()

    if args.html:
        pages = html_text(pages, "raw", out_col="content")
    else:
        pages = pages.withColumn("content", F.col("raw"))
    pages = pages.withColumn(
        "n_words",
        F.size(F.filter(F.split(F.col("content"), r"\s+"), lambda w: F.length(w) > 0)),
    ).where(F.col("n_words") >= args.min_words)
    n_gated = pages.count()

    from pyspark.sql import Window

    canon = pages.withColumn("url_canon", canonical_url_col(F.col("url")))
    w = Window.partitionBy("url_canon").orderBy("url")
    canon = canon.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    n_urldedup = canon.count()

    keyed = canon.withColumn("_k", F.md5(canonical_text_col(F.col("content"))))
    w2 = Window.partitionBy("_k").orderBy("url")
    corpus = (
        keyed.withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") == 1)
        .select("url", "host", "path", "content", "n_words")
    )
    n_final = corpus.count()

    corpus.write.mode("overwrite").parquet(f"{args.out}/corpus")
    spark.createDataFrame(
        [
            (
                n_records, n_ok, n_polite, n_gated, n_urldedup, n_final,
                round(time.time() - t0, 3),
            )
        ],
        "n_records long, n_parsed long, n_polite long, n_gated long, "
        "n_urldedup long, n_final long, wall_s double",
    ).write.mode("overwrite").parquet(f"{args.out}/metrics")
    print(
        f"crawl: {n_records} records -> parsed {n_ok} -> polite {n_polite} "
        f"-> gated {n_gated} -> urldedup {n_urldedup} -> exact {n_final}"
    )


if __name__ == "__main__":
    main()
