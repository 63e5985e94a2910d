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
    red = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[stat]
    neigh = fan.groupBy("ix", "iy").agg(red("value").cast("double").alias("focal_val"))
    # keep only cells that exist in the input raster
    return raster.select("ix", "iy").join(neigh, ["ix", "iy"], "left")
