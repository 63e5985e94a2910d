"""Focal (neighborhood) aggregates — raster↔vector bridging windows.

The reference's nearest analogue is warp-based focal resampling
(`src/extensions.jl:59-75`); the north rule asks for tile-aligned window
aggregates. Implementation: offset-explode + groupBy on the centre cell —
each cell contributes itself to its (2r+1)² neighbours, then one partial+
final aggregation. This beats Window.rangeBetween for 2-d neighbourhoods
(Spark windows are 1-d) and the fan-out is constant (9 for r=1).

Cross-tile halos need no special handling in this formulation: the groupBy
key is the *neighbour* cell id, so contributions cross tile boundaries
through the shuffle exactly like any other aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def focal_mean(raster: DataFrame, radius: int = 1, stat: str = "mean") -> DataFrame:
    """(ix, iy, value) → (ix, iy, focal stat of the (2r+1)² neighbourhood).

    NULL cells contribute nothing (skipmissing); cells outside the stored
    raster don't exist, so borders average over the available neighbours —
    matching GDAL's edge behaviour for focal means.
    """
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    fan = (
        raster.where(F.col("value").isNotNull())
        .select("ix", "iy", "value", F.explode(offs).alias("_ox"))
        .select("ix", "iy", "value", "_ox", F.explode(offs).alias("_oy"))
        .select(
            (F.col("ix") + F.col("_ox")).alias("ix"),
            (F.col("iy") + F.col("_oy")).alias("iy"),
            "value",
        )
    )
    red = {
        "mean": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        # exact interpolated median — matches DuckDB median()/quantile_cont
        "median": lambda c: F.percentile(c, F.lit(0.5)),
    }[stat]
    neigh = fan.groupBy("ix", "iy").agg(red("value").cast("double").alias("focal_val"))
    # keep only cells that exist in the input raster
    return raster.select("ix", "iy").join(neigh, ["ix", "iy"], "left")


def focal_weighted(raster: DataFrame, radius: int = 1) -> DataFrame:
    """Weighted-kernel focal mean: weight 1/(1 + ox² + oy²) by neighbour
    offset (an inverse-distance² kernel chosen RATIONAL so Spark and the
    DuckDB oracle compute bit-identical weights — a Gaussian would work the
    same way with exp()). Same offset-explode/groupBy shape as the plain
    focal stats: the weight rides the fan-out row, one shuffle, missing
    cells contribute neither value nor weight (renormalising the kernel at
    borders and holes, GDAL edge behaviour)."""
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    fan = (
        raster.where(F.col("value").isNotNull())
        .select("ix", "iy", "value", F.explode(offs).alias("_ox"))
        .select("ix", "iy", "value", "_ox", F.explode(offs).alias("_oy"))
        .select(
            (F.col("ix") + F.col("_ox")).alias("ix"),
            (F.col("iy") + F.col("_oy")).alias("iy"),
            "value",
            (
                F.lit(1.0)
                / (1.0 + F.col("_ox") * F.col("_ox") + F.col("_oy") * F.col("_oy"))
            ).alias("_w"),
        )
    )
    neigh = fan.groupBy("ix", "iy").agg(
        (F.sum(F.col("_w") * F.col("value")) / F.sum("_w")).alias("focal_val")
    )
    return raster.select("ix", "iy").join(neigh, ["ix", "iy"], "left")
