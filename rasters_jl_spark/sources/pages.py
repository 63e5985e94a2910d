"""Ingest: Common-Crawl-style pages → geotagged `pages_geo`.

Input shape (BASELINE.json input_hint):
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
The sandbox synthesises it deterministically from the driver's ``documents``
table; at production scale this is an Iceberg table scan.

Geotag rule (FIXTURES.md F1): a deterministic integer-hash → lat/lon —
expressible identically in Spark and DuckDB so the oracle can re-derive it:

    lat = ((doc_id * 2654435761) % 1800000) / 10000.0 - 90.0
    lon = ((doc_id * 40503)      % 3600000) / 10000.0 - 180.0

Per-row invariant: ``text`` passes through every stage byte-identical
(verified by the ``text_identity`` query and tests).

Cell assignment is pure integer column math (JVM, whole-stage codegen) —
see :mod:`rasters_jl_spark.grid`. A batched Arrow pandas-UDF variant with the
same semantics lives in :func:`geotag_pandas_udf` for parity with engines
whose geocoder is a Python library; the column-math path is the default hot
path because it never leaves the JVM.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, DoubleType

from rasters_jl_spark.grid import PAGES_RES, TILE_RES, WebGrid

LAT_MULT = 2654435761  # Knuth multiplicative-hash constant
LON_MULT = 40503

LAT_SQL = "((doc_id * 2654435761) % 1800000) / 10000.0 - 90.0"
LON_SQL = "((doc_id * 40503) % 3600000) / 10000.0 - 180.0"


def lat_col(doc_id: F.Column) -> F.Column:
    # (id * M) % L == ((id % L) * M) % L — same value, but the pre-reduction
    # keeps the product < 5e15 so int64 never overflows at 10¹²-row ids.
    return (((doc_id % F.lit(1800000)) * F.lit(LAT_MULT)) % F.lit(1800000)) / F.lit(
        10000.0
    ) - F.lit(90.0)


def lon_col(doc_id: F.Column) -> F.Column:
    return (((doc_id % F.lit(3600000)) * F.lit(LON_MULT)) % F.lit(3600000)) / F.lit(
        10000.0
    ) - F.lit(180.0)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def geotag_pages(docs: DataFrame, res: int = PAGES_RES, tile_res: int = TILE_RES) -> DataFrame:
    """documents → pages_geo with url/warc_ts/html synthesised per F1 and
    lat/lon/cell/tile assigned deterministically.

    Columns: url, warc_ts, html, text, lang, doc_id, lat, lon, cell, tile_id.
    ``cell`` is the fine-resolution id, ``tile_id`` the coarse partition key
    (the engine's explicit partition column — the reference's RasterSeries
    dim, SURVEY.md §1.4).
    """
    g = WebGrid(res)
    doc_id = F.col("doc_id")
    out = (
        docs.withColumn("url", F.concat(F.lit("https://example.org/d/"), doc_id.cast("string")))
        .withColumn(
            "warc_ts",
            F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(secs=(doc_id % 86400).cast("double")),
        )
        .withColumn("html", F.encode(F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>")), "UTF-8"))
        .withColumn("lat", lat_col(doc_id))
        .withColumn("lon", lon_col(doc_id))
    )
    out = out.withColumn("cell", g.cell_col(F.col("lon"), F.col("lat")))
    out = out.withColumn("tile_id", g.parent_cell_col(F.col("cell"), tile_res))
    return out


def pages_geo(spark: SparkSession, sf_dir: str, res: int = PAGES_RES) -> DataFrame:
    return geotag_pages(load_documents(spark, sf_dir), res=res)


def pages_geo_sql(res: int = PAGES_RES, tile_res: int = TILE_RES, table: str = "documents") -> str:
    """DuckDB CTE body producing the same pages_geo relation (oracle side)."""
    g = WebGrid(res)
    return f"""
    SELECT
        'https://example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
        TIMESTAMP '2025-01-01 00:00:00' + (doc_id % 86400) * INTERVAL 1 SECOND AS warc_ts,
        text, lang, doc_id, n_chars,
        {LAT_SQL} AS lat,
        {LON_SQL} AS lon,
        {g.cell_sql(f"({LON_SQL})", f"({LAT_SQL})")} AS cell,
        {g.parent_cell_sql(g.cell_sql(f"({LON_SQL})", f"({LAT_SQL})"), tile_res)} AS tile_id
    FROM {table}
    """


# ---- pandas-UDF geotag variant (Arrow-batched; semantics identical) ----

_GEO_SCHEMA = StructType(
    [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
)


def geotag_pandas_udf():
    """Arrow-vectorised geocoder stand-in: same hash formula, batched numpy.

    At production scale this is where a real geocoding model/library would
    run (mapInPandas over html bytes); kept as the pluggable slow path.
    """

    @F.pandas_udf(_GEO_SCHEMA)
    def _geotag(doc_id: pd.Series) -> pd.DataFrame:
        lat = (doc_id * LAT_MULT) % 1800000 / 10000.0 - 90.0
        lon = (doc_id * LON_MULT) % 3600000 / 10000.0 - 180.0
        return pd.DataFrame({"lat": lat, "lon": lon})

    return _geotag
