"""Deterministic synthetic rasters derived from the driver's tables.

A "raster" in this engine is a long-format DataFrame ``(ix:int, iy:int,
value:double)`` + a :class:`GridSpec` (SURVEY.md §1.4). For correctness
queries the raster must be derivable *identically* in Spark and DuckDB, so
it is synthesised by pure integer arithmetic from ``documents``:

    ix = doc_id % NX, iy = (doc_id // NX) % NY, value = Σ n_chars per cell
    value := NULL where (ix*7 + iy*13) % 11 == 0     (the missingval pattern)

Layer 'b' uses a different reduction and missing pattern so mask-by-raster
tests exercise per-layer missing values (`src/stack.jl:31-32`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rasters_jl_spark.grid import GridSpec

RASTER_NX = 20
RASTER_NY = 20
# Grid centers at integer coordinates 0..19 (the reference's X(0:19) lookup).
RASTER_GRID = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, nx=RASTER_NX, ny=RASTER_NY)

MISS_A_SQL = "((ix * 7 + iy * 13) % 11 = 0)"
MISS_B_SQL = "((ix * 3 + iy * 5) % 13 = 0)"


def synth_raster(spark: SparkSession, sf_dir: str, layer: str = "a") -> DataFrame:
    """(ix, iy, value) raster from documents; layer 'a' or 'b'."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ix = (F.col("doc_id") % RASTER_NX).cast("int")
    iy = (F.floor(F.col("doc_id") / RASTER_NX) % RASTER_NY).cast("int")
    base = docs.select(ix.alias("ix"), iy.alias("iy"), "doc_id", "n_chars")
    if layer == "a":
        agg = base.groupBy("ix", "iy").agg(F.sum("n_chars").alias("v"))
        miss = (F.col("ix") * 7 + F.col("iy") * 13) % 11 == 0
    elif layer == "b":
        agg = base.groupBy("ix", "iy").agg(F.sum(F.col("doc_id") % 97).alias("v"))
        miss = (F.col("ix") * 3 + F.col("iy") * 5) % 13 == 0
    else:
        raise ValueError(layer)
    return agg.select(
        "ix",
        "iy",
        F.when(miss, F.lit(None).cast("double")).otherwise(F.col("v").cast("double")).alias("value"),
    )


def synth_raster_sql(layer: str = "a", table: str = "documents") -> str:
    """DuckDB CTE body for the identical raster."""
    if layer == "a":
        v, miss = "SUM(n_chars)", MISS_A_SQL
    else:
        v, miss = "SUM(doc_id % 97)", MISS_B_SQL
    return f"""
    SELECT ix, iy,
           CASE WHEN {miss} THEN NULL ELSE CAST(v AS DOUBLE) END AS value
    FROM (
        SELECT CAST(doc_id % {RASTER_NX} AS INT) AS ix,
               CAST((doc_id // {RASTER_NX}) % {RASTER_NY} AS INT) AS iy,
               {v} AS v
        FROM {table}
        GROUP BY 1, 2
    )
    """
