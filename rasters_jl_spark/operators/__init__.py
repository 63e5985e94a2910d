from rasters_jl_spark.operators.core import (  # noqa: F401
    classify,
    crop,
    extend,
    mask_geom,
    mask_raster,
    points,
    replace_missing,
    trim,
)
from rasters_jl_spark.operators.aggregate import aggregate, disaggregate  # noqa: F401
from rasters_jl_spark.operators.mosaic import mosaic  # noqa: F401
from rasters_jl_spark.operators.rasterize import rasterize_cells, rasterize_points  # noqa: F401
from rasters_jl_spark.operators.zonal import zonal_pages, zonal_raster  # noqa: F401
from rasters_jl_spark.operators.extract import extract_points  # noqa: F401
from rasters_jl_spark.operators.resample import (  # noqa: F401
    cellarea,
    coverage_polygons,
    coverage_rect,
    coverage_subpixel,
    resample,
)
from rasters_jl_spark.operators.knn import knn_pages  # noqa: F401
from rasters_jl_spark.operators.focal import focal_mean  # noqa: F401
from rasters_jl_spark.operators.sample import sample_weighted  # noqa: F401
