"""Additional operator queries + oracles: missingmask, points, mosaic_last,
locus aggregate, fractional resample, create, line extract, embedding
near-dup, series slicing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rasters_jl_spark import fixtures as FX
from rasters_jl_spark.functions import ann
from rasters_jl_spark.grid import GridSpec
from rasters_jl_spark.operators.aggregate import aggregate
from rasters_jl_spark.operators.core import classify, points
from rasters_jl_spark.operators.extras import (
    create_raster,
    extract_lines,
    fractional_resample,
    missingmask,
    slice_series,
)
from rasters_jl_spark.queries_core import RAST_A_CTE, _MOSAIC_CTES, _pip_cells_cte, _region_df, _REG1, _REG2
from rasters_jl_spark.operators.mosaic import mosaic
from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster

G = RASTER_GRID


# ------------------------------------------------------------ missingmask
def q_missingmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    return missingmask(synth_raster(spark, sf_dir, "a"), G, [FX.RASTER_POLYS[1]], "center")


SQL_missingmask = f"""WITH {RAST_A_CTE}, {_pip_cells_cte([FX.RASTER_POLYS[1]])}
SELECT r.ix, r.iy, CASE WHEN p.ix IS NOT NULL THEN TRUE END AS mask
FROM rast r LEFT JOIN (SELECT DISTINCT ix, iy FROM pip) p ON r.ix = p.ix AND r.iy = p.iy"""


# ----------------------------------------------------------------- points
def q_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return points(synth_raster(spark, sf_dir, "a"), G, skipmissing=True)


SQL_points = f"""WITH {RAST_A_CTE}
SELECT {G.x_sql('ix')} AS x, {G.y_sql('iy')} AS y, value
FROM rast WHERE value IS NOT NULL"""


# ------------------------------------------------------------ mosaic_last
def q_mosaic_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = mosaic([_region_df(spark, _REG1), _region_df(spark, _REG2)], "last")
    return out.select("ix", "iy", F.round("value", 6).alias("value"))


SQL_mosaic_last = f"""WITH {_MOSAIC_CTES}
SELECT COALESCE(r1.ix, r2.ix) AS ix, COALESCE(r1.iy, r2.iy) AS iy,
       ROUND(COALESCE(r2.value, r1.value), 6) AS value
FROM r1 FULL OUTER JOIN r2 ON r1.ix = r2.ix AND r1.iy = r2.iy"""


# -------------------------------------------------------- aggregate_locus
def q_aggregate_locus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate(synth_raster(spark, sf_dir, "a"), FX.AGG_SCALE, "center")


_OFF = FX.AGG_SCALE // 2
SQL_aggregate_locus = f"""WITH {RAST_A_CTE}
SELECT CAST(ix // {FX.AGG_SCALE} AS INT) AS ix, CAST(iy // {FX.AGG_SCALE} AS INT) AS iy, value
FROM rast WHERE ix % {FX.AGG_SCALE} = {_OFF} AND iy % {FX.AGG_SCALE} = {_OFF}"""


# --------------------------------------------------- fractional_resample
def q_fractional_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = classify(synth_raster(spark, sf_dir, "a"), FX.CLASSIFY_BINS, others=0)
    return fractional_resample(cat, FX.AGG_SCALE)


def _classify_case_sql() -> str:
    whens = " ".join(
        f"WHEN value >= {lo!r} AND value < {hi!r} THEN {cls}" for lo, hi, cls in FX.CLASSIFY_BINS
    )
    return f"CASE WHEN value IS NULL THEN NULL {whens} ELSE 0 END"


SQL_fractional_resample = f"""WITH {RAST_A_CTE},
cat AS (SELECT ix, iy, {_classify_case_sql()} AS value FROM rast),
cnt AS (
    SELECT CAST(ix // {FX.AGG_SCALE} AS INT) AS ix, CAST(iy // {FX.AGG_SCALE} AS INT) AS iy,
           value AS category, COUNT(*) AS n
    FROM cat WHERE value IS NOT NULL GROUP BY 1, 2, 3
),
tot AS (SELECT ix, iy, SUM(n) AS t FROM cnt GROUP BY ix, iy)
SELECT c.ix, c.iy, c.category, ROUND(CAST(c.n AS DOUBLE) / t.t, 6) AS frac
FROM cnt c JOIN tot t ON c.ix = t.ix AND c.iy = t.iy"""


# ----------------------------------------------------------------- create
_CREATE_GRID = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, nx=12, ny=9)


def q_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    return create_raster(spark, _CREATE_GRID, fill=1.5, missing_every=7)


SQL_create = f"""
SELECT CAST(x.ix AS INT) AS ix, CAST(y.iy AS INT) AS iy,
       CASE WHEN (x.ix + y.iy) % 7 = 0 THEN NULL ELSE 1.5 END AS value
FROM generate_series(0, {_CREATE_GRID.nx - 1}) x(ix)
CROSS JOIN generate_series(0, {_CREATE_GRID.ny - 1}) y(iy)"""


# ---------------------------------------------------------- extract_lines
_SEGS = [(1, 2.0, 3.0, 2.0, 15.0), (2, 0.0, 7.0, 19.0, 7.0)]


def q_extract_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = synth_raster(spark, sf_dir, "a")
    return extract_lines(spark, _SEGS, r, G, skipmissing=True)


SQL_extract_lines = f"""WITH {RAST_A_CTE},
cells AS (
    SELECT 1 AS geom_id, 2 AS cix, CAST(iy.i AS INT) AS ciy
    FROM generate_series(3, 15) iy(i)
    UNION ALL
    SELECT 2 AS geom_id, CAST(ix.i AS INT) AS cix, 7 AS ciy
    FROM generate_series(0, 19) ix(i)
)
SELECT c.cix AS ix, c.ciy AS iy, c.geom_id, r.value
FROM cells c JOIN rast r ON r.ix = c.cix AND r.iy = c.ciy
WHERE r.value IS NOT NULL"""


# -------------------------------------------------------- dedup_embedding
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: planted duplicate vectors found through
    LSH bucket blocking + exact cosine verify ≥ 0.9999."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    dups = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(dups)
    withb = aug.select(
        "vec_id", F.col("embedding").alias("_v"), ann.lsh_bucket_col(F.col("embedding")).alias("bucket")
    )
    a = withb.select(F.col("vec_id").alias("vec_a"), F.col("_v").alias("_va"), "bucket")
    b = withb.select(F.col("vec_id").alias("vec_b"), F.col("_v").alias("_vb"), "bucket")
    sim = ann.cosine_col(F.col("_va"), F.col("_vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(sim, 6))
        .where(F.col("cosine") >= 0.9999)
        .select("vec_a", "vec_b", "cosine")
    )


from rasters_jl_spark.queries_text import _lsh_bucket_sql  # noqa: E402

SQL_dedup_embedding = f"""WITH aug AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 20 = 0
),
wb AS (SELECT vec_id, v, {_lsh_bucket_sql('v')} AS bucket FROM aug),
scored AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v) /
                 (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.9999"""


# ------------------------------------------------------------ series_daily
def q_series_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sliced = slice_series(events, "ts", "1 day")
    return sliced.groupBy(F.to_date("slice_ts").alias("slice_date")).agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value")
    )


SQL_series_daily = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS slice_date, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1"""


# ------------------------------------------------------ multimodal_features
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads
    (decode kernel stubbed per container limits; Arrow plumbing real).
    No SQL oracle — driver records the rows-only check."""
    from rasters_jl_spark.functions.multimodal import extract_features, synth_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return extract_features(synth_media(docs)).select("media_id", "kind", "n_bytes")
