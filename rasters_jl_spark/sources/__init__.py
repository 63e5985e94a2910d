from rasters_jl_spark.sources.pages import geotag_pages, load_documents, pages_geo  # noqa: F401
from rasters_jl_spark.sources.raster_synth import synth_raster, RASTER_GRID  # noqa: F401
