"""Layer metadata table — per-layer missingval / dtype / unit provenance.

The reference's RasterStack carries one missingval per layer
(`src/stack.jl:31-32`), and `replace_missing` accepts a NamedTuple of
per-layer sentinels (`src/methods/replace_missing.jl:24-66`). The engine's
data convention is NULL end-to-end, so the metadata table's job is
SENTINEL PROVENANCE: which sentinel each layer's external format used, so
ingest can normalise (sentinel → NULL) and sinks can re-materialise
(NULL → sentinel) per layer. In production this is a tiny catalog table
(or Iceberg table properties); here it is a broadcastable DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYERS_SCHEMA = "layer string, missingval double, dtype string, unit string"


def layers_meta(spark: SparkSession, entries: list[tuple[str, float, str, str]]) -> DataFrame:
    """(layer, missingval, dtype, unit) — one row per stack layer."""
    return spark.createDataFrame(entries, LAYERS_SCHEMA)


def replace_missing_stack(stack: DataFrame, meta: DataFrame, to_null: bool = True) -> DataFrame:
    """Per-layer sentinel ⇄ NULL over a stacked raster (ix, iy, layer,
    value) — the reference's NamedTuple `replace_missing` form.

    One broadcast join on the (tiny) metadata table + a CASE — no shuffle.
    Layers absent from the metadata table pass through unchanged.
    """
    m = meta.select("layer", F.col("missingval").alias("_mv"))
    j = stack.join(F.broadcast(m), "layer", "left")
    v = F.col("value")
    if to_null:
        out = F.when(F.col("_mv").isNotNull() & (v == F.col("_mv")), F.lit(None)).otherwise(v)
    else:
        out = F.when(v.isNull(), F.col("_mv")).otherwise(v)
    return j.select("ix", "iy", "layer", out.alias("value"))
