"""Cluster job: corpus deduplication (training-data pipeline entrypoint).

    spark-submit --py-files dist/rasters_jl_spark.zip jobs/dedup_job.py \
        --docs <parquet path | iceberg:cat.db.table> --out <output dir> \
        [--threshold 0.5] [--snapshot-id N]

Outputs under --out:
- ``exact_groups``  (dup_key, n_dups, keeper)      — byte-identical dups
- ``near_pairs``    (doc_a, doc_b, jaccard)        — MinHash+LSH verified
- ``components``    (node, component)              — dup clusters; component
                                                     id IS the keeper doc_id
- ``metrics``       one row: corpus size, group/pair/cluster counts, walls

Unlike the tile-batched zonal job, dedup is a GLOBAL self-join — there is
no per-tile unit of resumable work. Resumability comes from input pinning
instead: pass --snapshot-id (Iceberg) so a re-run reads the exact table
version the first attempt saw, and each output is an atomic overwrite.
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
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("rasters_jl_spark.dedup").getOrCreate()

    from rasters_jl_spark.functions.dedup import (
        connected_components,
        exact_dedup_groups,
        minhash_dedup_pairs,
        oversized_buckets,
    )
    from rasters_jl_spark.sources.catalog import read_table

    docs = read_table(spark, args.docs, snapshot_id=args.snapshot_id).select(
        "doc_id", args.text_col
    )
    n_docs = docs.count()
    walls = {}

    t0 = time.time()
    exact = exact_dedup_groups(docs, F.md5(F.col(args.text_col)))
    exact.write.mode("overwrite").parquet(f"{args.out}/exact_groups")
    n_groups = spark.read.parquet(f"{args.out}/exact_groups").count()
    walls["exact_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    pairs = minhash_dedup_pairs(docs, args.text_col, threshold=args.threshold)
    pairs.write.mode("overwrite").parquet(f"{args.out}/near_pairs")
    pairs_back = spark.read.parquet(f"{args.out}/near_pairs")
    n_pairs = pairs_back.count()
    walls["minhash_s"] = round(time.time() - t0, 3)

    # truncation is never silent: buckets the pair generator dropped (over
    # BUCKET_CAP — empty-text/boilerplate degeneracies) are persisted and
    # reported so they can be handled out-of-band
    dropped = oversized_buckets(docs, args.text_col)
    dropped.write.mode("overwrite").parquet(f"{args.out}/dropped_buckets")
    n_dropped = spark.read.parquet(f"{args.out}/dropped_buckets").count()
    if n_dropped:
        print(f"WARNING: {n_dropped} LSH buckets over cap were dropped from pair generation")

    t0 = time.time()
    comp = connected_components(pairs_back)  # from disk: no pair recompute
    comp.write.mode("overwrite").parquet(f"{args.out}/components")
    n_nodes = spark.read.parquet(f"{args.out}/components").count()
    walls["components_s"] = round(time.time() - t0, 3)

    metrics = spark.createDataFrame(
        [
            (
                n_docs,
                n_groups,
                n_pairs,
                n_nodes,
                walls["exact_s"],
                walls["minhash_s"],
                walls["components_s"],
            )
        ],
        "n_docs long, n_exact_groups long, n_near_pairs long, n_clustered_nodes long,"
        " exact_s double, minhash_s double, components_s double",
    )
    metrics.write.mode("overwrite").parquet(f"{args.out}/metrics")
    print(
        f"dedup: {n_docs} docs -> {n_groups} exact groups, "
        f"{n_pairs} near pairs, {n_nodes} clustered nodes"
    )
    spark.stop()


if __name__ == "__main__":
    main()
