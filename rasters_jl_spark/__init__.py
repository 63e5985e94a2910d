"""rasters_jl_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of rafaqz/Rasters.jl (resample, crop, mask,
mosaic, rasterize, zonal stats, extract, aggregate, coverage, cellarea) as
Spark DataFrame transforms over long-format raster tables and a geotagged
web-pages table, with integer cell indexing, cell-prefix hash joins,
point-in-polygon refinement, kNN via cell-ring expansion and tile-aligned
window aggregates.

Design rules (see SURVEY.md §4):
- canonical integer cell ids assigned once at ingest; all joins on ints
  (the reference's StableRange float-determinism concern, solved structurally)
- missing values are SQL NULL end-to-end (the reference's ``missingval``
  normalised at ingest, `src/methods/replace_missing.jl`)
- geometry sides of joins are broadcast; page/cell sides are partitioned
- Python crosses the boundary only in Arrow-vectorised pandas UDFs, and only
  where built-in functions genuinely cannot express the kernel
"""

__version__ = "0.1.0"

from rasters_jl_spark.grid import GridSpec, WebGrid  # noqa: F401
