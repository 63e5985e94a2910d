"""Auxiliary measurement harness for the optimization round (guide §1).

NOT the driver bench — `bench.py` is frozen for measurement. This file
isolates each suite query (and its sub-pieces) behind the noop sink
(`df.write.format("noop")` — guide §1.4) so the computation is timed
without collect/driver cost, labels jobs (§1.5), and prints a JSON line
per measurement. Use:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [piece ...]

Pieces: pages, q1, q2, q3, q4, q5, q6, q6_sig, q6_cand, q2_cand.
Default: all. Each piece runs min-of-3 fresh-plan trials like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from rasters_jl_spark import fixtures as FX  # noqa: E402
from rasters_jl_spark.grid import PAGES_RES, WebGrid  # noqa: E402
from rasters_jl_spark.operators.knn import knn_pages  # noqa: E402
from rasters_jl_spark.operators.zonal import spatial_join_pages, zonal_pages  # noqa: E402
from rasters_jl_spark.session import get_spark  # noqa: E402
from rasters_jl_spark.sources.pages import lat_col, lon_col  # noqa: E402

from bench import expanded_pages  # noqa: E402  (reuses the frozen corpus builder)

TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, spark, thunk, trials=TRIALS):
    walls = []
    for _ in range(trials):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        thunk()
        walls.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"piece": name, "min": min(walls), "walls": walls}))
    return min(walls)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    want = set(a for a in sys.argv[1:] if not a.startswith("-")) or None

    def on(name):
        return want is None or name in want

    n_docs = expanded_pages(spark, sf_dir).count()

    if on("pages"):
        # the shared synthetic-corpus construction every query pays
        timed("pages: expanded_pages noop", spark, lambda: noop(expanded_pages(spark, sf_dir)))
        timed("pages: count only", spark, lambda: expanded_pages(spark, sf_dir).count())
    if on("q1"):
        timed(
            "q1 zonal noop", spark,
            lambda: noop(zonal_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO, value_col="n_chars")),
        )
        timed(
            "q1 zonal collect", spark,
            lambda: zonal_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO, value_col="n_chars").collect(),
        )
    if on("q2_cand"):
        # join WITHOUT the PIP refinement — isolates PIP cost
        def cand_only():
            g = WebGrid(5)
            p = expanded_pages(spark, sf_dir).withColumn(
                "_cover_cell", g.cell_col(F.col("lon"), F.col("lat"))
            )
            from rasters_jl_spark.functions.geometry import polygon_cover_df

            cover = polygon_cover_df(spark, FX.POLYS_GEO, 5)
            noop(p.join(F.broadcast(cover), p["_cover_cell"] == cover["cover_cell"]))

        timed("q2 candidates only (no PIP)", spark, cand_only)
    if on("q2"):
        timed(
            "q2 spatial_join count", spark,
            lambda: spatial_join_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO).count(),
        )
    if on("q3"):
        timed(
            "q3 zonal salted collect", spark,
            lambda: zonal_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO, n_salt=8).collect(),
        )
    if on("q4"):
        p_knn = expanded_pages(spark, sf_dir).select("doc_id", "lat", "lon", "cell").cache()
        p_knn.count()
        ids = spark.range(FX.KNN_ID_BASE, FX.KNN_ID_BASE + 50)
        qdf = ids.select(
            (F.col("id") - FX.KNN_ID_BASE).alias("q_id"),
            lat_col(F.col("id")).alias("qlat"),
            lon_col(F.col("id")).alias("qlon"),
        )
        timed(
            "q4 knn collect", spark,
            lambda: knn_pages(qdf, p_knn, k=5, res=PAGES_RES, n_pages=n_docs, n_queries=50).collect(),
        )
        p_knn.unpersist()
    if on("q5"):
        timed(
            "q5 tile rollup collect", spark,
            lambda: expanded_pages(spark, sf_dir)
            .groupBy("tile_id")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
            .collect(),
        )
    if on("q6_sig"):
        from rasters_jl_spark.functions import dedup
        from rasters_jl_spark.queries_text import _aug_near

        timed(
            "q6 signatures only noop", spark,
            lambda: noop(dedup.minhash_signatures(_aug_near(spark, sf_dir))),
        )
    if on("q6_cand"):
        from rasters_jl_spark.functions import dedup
        from rasters_jl_spark.queries_text import _aug_near

        timed(
            "q6 candidate pairs noop", spark,
            lambda: noop(dedup.minhash_candidate_pairs(_aug_near(spark, sf_dir))),
        )
    if on("q6"):
        from rasters_jl_spark.queries_text import q_dedup_minhash

        timed("q6 dedup_minhash count", spark, lambda: q_dedup_minhash(spark, sf_dir).count())


if __name__ == "__main__":
    main()
