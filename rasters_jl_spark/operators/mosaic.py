"""mosaic — overlay N regions, per-cell reduce across overlaps.

Reference: `src/methods/mosaic.jl:86-146,186-311`. Region order is
meaningful for first/last (`test/mosaic.jl:14-33`), so each region carries an
explicit ``region_seq`` — the engine's replacement for the reference's
argument order (`SURVEY.md §2.3`). Spark: unionByName → groupBy(cell) —
pure partial+final aggregation; the reference's `_mosaic_mean!` sum+count
optimisation (`src/methods/mosaic.jl:287-311`) is exactly what `avg` already
does.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mosaic(regions: list[DataFrame], method: str = "first", layered: bool = False) -> DataFrame:
    """Overlay rasters that share a world grid (same GridSpec indexing).

    Missing (NULL) values never win: first/last pick the first/last
    *non-missing* region per cell, matching the reference goldens where
    reg1's 0.4 beats reg2's 1.1 under ``first`` (`test/mosaic.jl:14-33`).

    ``layered=True`` mosaics stacks / 3-d rasters (`test/mosaic.jl:43-67`):
    each region carries a ``layer`` column and the reduce keys on
    (ix, iy, layer) — one extra groupBy key, same single shuffle.
    """
    keys = ["ix", "iy"] + (["layer"] if layered else [])
    tagged = [
        r.select(*keys, "value", F.lit(i).alias("_seq")) for i, r in enumerate(regions)
    ]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    nn = u.where(F.col("value").isNotNull())
    g = nn.groupBy(*keys)
    if method == "first":
        agg = g.agg(F.min_by("value", "_seq").alias("value"))
    elif method == "last":
        agg = g.agg(F.max_by("value", "_seq").alias("value"))
    elif method == "mean":
        agg = g.agg(F.avg("value").alias("value"))
    elif method == "sum":
        agg = g.agg(F.sum("value").alias("value"))
    elif method == "min":
        agg = g.agg(F.min("value").alias("value"))
    elif method == "max":
        agg = g.agg(F.max("value").alias("value"))
    elif method == "count":
        agg = g.agg(F.count("value").cast("double").alias("value"))
    else:
        raise ValueError(method)
    # cells present in some region but missing everywhere stay NULL
    universe = u.select(*keys).distinct()
    return universe.join(agg, keys, "left")
