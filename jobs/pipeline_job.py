"""Cluster job: end-to-end training-data curation pipeline.

    spark-submit --py-files dist/rasters_jl_spark.zip jobs/pipeline_job.py \
        --docs <parquet path | iceberg:cat.db.table> --out <output dir> \
        [--min-quality 0.5] [--lang en] [--jaccard 0.5] [--sample N] \
        [--snapshot-id N] [--eval-docs <parquet path>] [--split]

The composite curation flow a 100 TB pretraining corpus goes through,
chained from the engine's individually-oracled operators:

    score     quality features + language-ID            (pure codegen)
    filter    quality ≥ threshold AND predicted lang    (pushed predicates)
    exact     md5 groups → keep min-doc_id per group    (one hash groupBy)
    near      MinHash b×r LSH → verified pairs →
              connected components → keep component
              representative                            (bucketed, capped)
    decon     optional eval-set decontamination:
              drop docs sharing an n-gram with
              --eval-docs                               (broadcast gram set)
    sample    optional weighted downsample (A-ES)       (sort-limit top-n)
    split     optional deterministic train/val/test
              column (md5 per-mille buckets)            (pure projection)

Each stage writes its row count into ``metrics``; the curated corpus is an
atomic overwrite under --out/corpus. Resumability = input pinning
(--snapshot-id with Iceberg) like dedup_job; every output path is a single
atomic overwrite, so a rerun is idempotent.

Stage maths: survivors join keepers with LEFT ANTI on the drop set — no
driver-side id collection; the drop sets stay DataFrames end-to-end.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--eval-docs", default=None)
    ap.add_argument("--split", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("rasters_jl_spark.pipeline").getOrCreate()

    from rasters_jl_spark.functions.dedup import (
        connected_components,
        exact_dedup_groups,
        minhash_dedup_pairs,
    )
    from rasters_jl_spark.functions.textstats import lang_id, quality_score
    from rasters_jl_spark.operators.sample import sample_weighted
    from rasters_jl_spark.sources.catalog import read_table

    t0 = time.time()
    docs = read_table(spark, args.docs, snapshot_id=args.snapshot_id).select(
        "doc_id", "text", "n_chars"
    )
    n_in = docs.count()

    # -- score + filter (one pass; the two scorers share the token split) --
    q = quality_score(docs).select("doc_id", "quality")
    lg = lang_id(docs).select("doc_id", "lang_pred")
    kept = (
        docs.join(q, "doc_id")
        .join(lg, "doc_id")
        .where((F.col("quality") >= args.min_quality) & (F.col("lang_pred") == args.lang))
        .select("doc_id", "text", "n_chars")
    )
    n_filtered = kept.count()

    # -- exact dedup: drop every row of a dup group except the keeper --
    groups = exact_dedup_groups(kept, F.md5(F.col("text")), min_count=2)
    dup_rows = kept.select(F.md5(F.col("text")).alias("dup_key"), "doc_id").join(
        groups.select("dup_key", "keeper"), "dup_key"
    )
    exact_drops = dup_rows.where(F.col("doc_id") != F.col("keeper")).select("doc_id")
    after_exact = kept.join(exact_drops, "doc_id", "left_anti")
    n_exact = after_exact.count()

    # -- near-dup: verified pairs → components → drop non-representatives --
    pairs = minhash_dedup_pairs(after_exact, threshold=args.jaccard)
    comp = connected_components(pairs)
    near_drops = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    curated = after_exact.join(near_drops, "doc_id", "left_anti")
    n_near = curated.count()

    # -- optional eval-set decontamination (same LEFT ANTI shape) --
    n_decon = n_near
    if args.eval_docs:
        from rasters_jl_spark.functions.dedup import decontaminate

        contaminated = decontaminate(curated, spark.read.parquet(args.eval_docs)).select(
            "doc_id"
        )
        curated = curated.join(contaminated, "doc_id", "left_anti")
        n_decon = curated.count()

    # -- optional weighted downsample --
    if args.sample:
        curated = sample_weighted(curated, args.sample, weight_col="n_chars")
    # -- optional deterministic split column --
    if args.split:
        from rasters_jl_spark.operators.sample import split_by_hash

        curated = split_by_hash(curated)
    curated.write.mode("overwrite").parquet(f"{args.out}/corpus")
    n_out = spark.read.parquet(f"{args.out}/corpus").count()

    wall = round(time.time() - t0, 3)
    metrics = spark.createDataFrame(
        [(n_in, n_filtered, n_exact, n_near, n_decon, n_out, wall)],
        "n_input long, n_after_filter long, n_after_exact long,"
        " n_after_neardup long, n_after_decon long, n_output long, wall_s double",
    )
    metrics.write.mode("overwrite").parquet(f"{args.out}/metrics")
    print(
        f"pipeline: {n_in} -> filter {n_filtered} -> exact {n_exact} "
        f"-> neardup {n_near} -> decon {n_decon} -> out {n_out} in {wall}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
