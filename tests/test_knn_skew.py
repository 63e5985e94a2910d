"""kNN exactness vs in-Spark brute force, and salted-join identity
(FIXTURES.md F9/F10)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rasters_jl_spark import fixtures as FX
from rasters_jl_spark.grid import PAGES_RES
from rasters_jl_spark.operators.knn import knn_pages
from rasters_jl_spark.operators.zonal import spatial_join_pages
from rasters_jl_spark.sources.pages import lat_col, lon_col, pages_geo


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return pages_geo(spark, sf_dir).cache()


def test_knn_matches_bruteforce(spark, pages):
    p = pages.select("doc_id", "lat", "lon", "cell")
    ids = spark.range(FX.KNN_ID_BASE, FX.KNN_ID_BASE + 10)
    queries = ids.select(
        (F.col("id") - FX.KNN_ID_BASE).alias("q_id"),
        lat_col(F.col("id")).alias("qlat"),
        lon_col(F.col("id")).alias("qlon"),
    )
    ring = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_pages(queries, p, k=5, res=PAGES_RES).collect()
    }
    d2 = (F.col("lat") - F.col("qlat")) ** 2 + (F.col("lon") - F.col("qlon")) ** 2
    w = Window.partitionBy("q_id").orderBy(F.col("_d").asc(), F.col("doc_id").asc())
    brute = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in queries.crossJoin(p)
        .withColumn("_d", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert ring == brute


def test_salted_join_identical_rows(pages):
    """Salting must not change the join row set (F10)."""
    plain = {
        (r["doc_id"], r["geom_id"])
        for r in spatial_join_pages(pages, FX.POLYS_GEO, n_salt=1).select("doc_id", "geom_id").collect()
    }
    salted = {
        (r["doc_id"], r["geom_id"])
        for r in spatial_join_pages(pages, FX.POLYS_GEO, n_salt=8).select("doc_id", "geom_id").collect()
    }
    assert plain == salted and len(plain) > 0


def test_skewed_hot_cell(spark):
    """80% of rows forced into one cell: salted join still exact (F10)."""
    n = 2000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    hot = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 != 0, F.lit(0.0005)).otherwise(lat_col(F.col("doc_id"))).alias("lat"),
        F.when(F.col("doc_id") % 5 != 0, F.lit(0.0005)).otherwise(lon_col(F.col("doc_id"))).alias("lon"),
        F.lit(1).alias("n_chars"),
    )
    from rasters_jl_spark.functions.geometry import Polygon

    box = [Polygon(1, ((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)))]
    plain = spatial_join_pages(hot, box, n_salt=1).count()
    salted = spatial_join_pages(hot, box, n_salt=8).count()
    assert plain == salted
    assert plain >= 0.8 * n


def test_pandas_pip_matches_expr(pages):
    """The Arrow pandas-UDF PIP and the codegen'd expression PIP agree."""
    a = {
        (r["doc_id"], r["geom_id"])
        for r in spatial_join_pages(pages, FX.POLYS_GEO).select("doc_id", "geom_id").collect()
    }
    b = {
        (r["doc_id"], r["geom_id"])
        for r in spatial_join_pages(pages, FX.POLYS_GEO, use_pandas_pip=True)
        .select("doc_id", "geom_id")
        .collect()
    }
    assert a == b


def test_knn_sparse_fine_resolution_brute_tier(spark):
    """<k candidates at a FINE resolution (res 12: 8192x4096 cells) must
    finish through the brute tier — no grid-sized ring array — and match
    the exact brute-force answer."""
    res = 12
    from rasters_jl_spark.grid import WebGrid

    g = WebGrid(res)
    # 12 pages scattered worldwide: any density-sized ring around a query
    # holds fewer than k of them
    pts = [(i, -80.0 + i * 13.7, -170.0 + i * 27.3) for i in range(12)]
    pages = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    pages = pages.withColumn("cell", g.cell_col(F.col("lon"), F.col("lat")))
    queries = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, -45.0, 100.0)], "q_id long, qlat double, qlon double"
    )
    got = {
        (r["q_id"], r["rank"]): (r["doc_id"], round(r["dist2"], 9))
        for r in knn_pages(queries, pages, k=5, res=res).collect()
    }
    # exact brute force in python
    want = {}
    for qid, qlat, qlon in [(1, 10.0, 20.0), (2, -45.0, 100.0)]:
        ds = sorted(
            ((qlat - la) ** 2 + (qlon - lo) ** 2, d) for d, la, lo in pts
        )
        for rank, (d2, doc) in enumerate(ds[:5], 1):
            want[(qid, rank)] = (doc, round(d2, 9))
    assert got == want
