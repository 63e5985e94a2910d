"""Dump .explain('formatted') for the six bench-suite queries to
plans/r08/<query>_<tag>.txt (tag = before/after). Usage:

    python tools/dump_plans_r08.py before [q1 q2 ...]

Uses the same DataFrame construction as bench.py's child_main so the plan
files match what the driver's bench actually executes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from rasters_jl_spark import fixtures as FX  # noqa: E402
from rasters_jl_spark.grid import PAGES_RES  # noqa: E402
from rasters_jl_spark.operators.knn import knn_pages  # noqa: E402
from rasters_jl_spark.operators.zonal import spatial_join_pages, zonal_pages  # noqa: E402
from rasters_jl_spark.session import get_spark  # noqa: E402
from rasters_jl_spark.sources.pages import lat_col, lon_col  # noqa: E402

from bench import expanded_pages  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    want = set(sys.argv[2:]) or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("/root/repo/plans/r08", exist_ok=True)

    n_docs = 1_000_000
    p_knn = expanded_pages(spark, sf_dir).select("doc_id", "lat", "lon", "cell")
    ids = spark.range(FX.KNN_ID_BASE, FX.KNN_ID_BASE + 50)
    qdf = ids.select(
        (F.col("id") - FX.KNN_ID_BASE).alias("q_id"),
        lat_col(F.col("id")).alias("qlat"),
        lon_col(F.col("id")).alias("qlon"),
    )

    def q6(spark, sf_dir):
        from rasters_jl_spark.queries_text import q_dedup_minhash

        return q_dedup_minhash(spark, sf_dir)

    builders = {
        "q1_zonal_pipeline": lambda: zonal_pages(
            expanded_pages(spark, sf_dir), FX.POLYS_GEO, value_col="n_chars"
        ),
        "q2_spatial_join": lambda: spatial_join_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO),
        "q3_zonal_salted": lambda: zonal_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO, n_salt=8),
        "q4_knn": lambda: knn_pages(qdf, p_knn, k=5, res=PAGES_RES, n_pages=n_docs, n_queries=50),
        "q5_tile_rollup": lambda: expanded_pages(spark, sf_dir)
        .groupBy("tile_id")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s")),
        "q6_dedup_minhash": lambda: q6(spark, sf_dir),
    }
    for name, build in builders.items():
        if want and name not in want and name.split("_")[0] not in want:
            continue
        df = build()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"/root/repo/plans/r08/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        import re

        plan = buf.getvalue()
        print(
            name,
            "shuffles=%d" % len(re.findall(r"hashpartitioning|rangepartitioning", plan)),
            "bcastX=%d" % len(re.findall(r"BroadcastExchange", plan)),
            "BHJ=%d" % len(re.findall(r"BroadcastHashJoin", plan)),
            "SMJ=%d" % len(re.findall(r"SortMergeJoin", plan)),
            "py=%d" % len(re.findall(r"ArrowEvalPython|BatchEvalPython", plan)),
            "->", path,
        )


if __name__ == "__main__":
    main()
