"""Extract goldens (`test/extract.jl:7-108` fixture F6) and the 2×2
mask/replace_missing goldens (`test/methods.jl:9-14,41-71` fixture F2)."""

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.grid import GridSpec
from rasters_jl_spark.operators.core import mask_raster, replace_missing
from rasters_jl_spark.operators.extract import extract_points

# F6: raster [3 4; 1 2] on X(10.0:-1.0:9.0) (reverse!), Y(0.1:0.1:0.2)
# A[1,1]=3 at (x=10,y=0.1), A[1,2]=4 at (10,0.2), A[2,1]=1 at (9,0.1), A[2,2]=2 at (9,0.2)
EXTRACT_GRID = GridSpec(x0=10.0, y0=0.1, dx=-1.0, dy=0.1, nx=2, ny=2)
RASTER_ROWS = [(0, 0, 3.0), (0, 1, 4.0), (1, 0, 1.0), (1, 1, 2.0)]
POINTS = [(0, 9.0, 0.1), (1, 9.0, 0.2), (2, 10.0, 0.3), (3, 10.0, 0.2)]


@pytest.fixture(scope="module")
def raster(spark):
    return spark.createDataFrame(RASTER_ROWS, "ix int, iy int, value double").cache()


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(POINTS, "pt_id int, x double, y double")


def test_extract_skipmissing_true(pts, raster):
    """Out-of-bounds point (10.0, 0.3) dropped; others return exact values
    (`test/extract.jl:22-40`)."""
    out = {r["pt_id"]: r["value"] for r in extract_points(pts, raster, EXTRACT_GRID).collect()}
    assert out == {0: 1.0, 1: 2.0, 3: 4.0}


def test_extract_skipmissing_false(pts, raster):
    """Left-join flavour keeps the miss as a NULL row (`test/extract.jl:60-76`)."""
    out = {r["pt_id"]: r["value"] for r in extract_points(pts, raster, EXTRACT_GRID, skipmissing=False).collect()}
    assert out == {0: 1.0, 1: 2.0, 2: None, 3: 4.0}


def test_extract_keeps_geometry_and_index(pts, raster):
    row = (
        extract_points(pts, raster, EXTRACT_GRID, skipmissing=True, keep_index=True)
        .where(F.col("pt_id") == 0)
        .collect()[0]
    )
    assert (row["x"], row["y"], row["ix"], row["iy"]) == (9.0, 0.1, 1, 0)


# ---- F2 2×2 mask / replace_missing goldens ----
# ga = [missing 7; 2 missing], b = [1 0.4; 2 missing]
GA = [(0, 0, None), (0, 1, 7.0), (1, 0, 2.0), (1, 1, None)]
GB = [(0, 0, 1.0), (0, 1, 0.4), (1, 0, 2.0), (1, 1, None)]


def _d(df):
    return {(r["ix"], r["iy"]): r["value"] for r in df.collect()}


def test_replace_missing_to_sentinel(spark):
    """replace_missing(ga, -9999) == [-9999 7; 2 -9999] (`test/methods.jl:50`)."""
    ga = spark.createDataFrame(GA, "ix int, iy int, value double")
    out = _d(replace_missing(ga, -9999.0, to_null=False))
    assert out == {(0, 0): -9999.0, (0, 1): 7.0, (1, 0): 2.0, (1, 1): -9999.0}


def test_replace_missing_roundtrip(spark):
    ga = spark.createDataFrame(GA, "ix int, iy int, value double")
    sentinel = replace_missing(ga, -9999.0, to_null=False)
    back = _d(replace_missing(sentinel, -9999.0, to_null=True))
    assert back == {(0, 0): None, (0, 1): 7.0, (1, 0): 2.0, (1, 1): None}


def test_mask_by_raster_golden(spark):
    """mask(b; with=ga): b missing where ga missing (`test/methods.jl:77-96`)."""
    ga = spark.createDataFrame(GA, "ix int, iy int, value double")
    gb = spark.createDataFrame(GB, "ix int, iy int, value double")
    out = _d(mask_raster(gb, ga))
    assert out == {(0, 0): None, (0, 1): 0.4, (1, 0): 2.0, (1, 1): None}
    inv = _d(mask_raster(gb, ga, invert=True))
    assert inv == {(0, 0): 1.0, (0, 1): None, (1, 0): None, (1, 1): None}


def test_extract_many_single_scan(spark):
    """1,024-polygon extract is ONE raster scan through the broadcast
    block-cover join: no Union, no per-polygon literal subtrees, and zero
    hash-partitioning shuffles before the (test-side) aggregation."""
    import re

    from rasters_jl_spark.operators.extract import extract_polygons
    from rasters_jl_spark import fixtures as FX
    from rasters_jl_spark.queries_extra import _zm_raster, _ZM_POLYS

    hits = extract_polygons(_zm_raster(spark), FX.MANY_GRID, _ZM_POLYS)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan[:2000]
    # expression size is O(1) in polygon count: the single-scan plan string
    # stays small; the old per-polygon-literal shape exceeded this by 100x
    assert len(plan) < 200_000
    assert hits.count() > 0


def test_crop_to_geoms_matches_reference_shape(spark):
    """crop(to=polygon): the reference's -20..-5 x 10..30 polygon crop of a
    -20..-5 x 0..30 Points raster keeps (16, 21) cells
    (test/methods.jl:481-488)."""
    from rasters_jl_spark.functions.geometry import Polygon
    from rasters_jl_spark.grid import GridSpec
    from rasters_jl_spark.operators.core import crop_to_geoms

    g = GridSpec(x0=-20.0, y0=0.0, dx=1.0, dy=1.0, nx=16, ny=31)
    xs = spark.range(16).selectExpr("cast(id as int) ix")
    ys = spark.range(31).selectExpr("cast(id as int) iy")
    r = xs.crossJoin(ys).selectExpr("ix", "iy", "0.0 AS value")
    poly = Polygon(1, ((-20.0, 30.0), (-20.0, 10.0), (-5.0, 10.0), (-5.0, 30.0)))
    out = crop_to_geoms(r, g, [poly])
    assert out.count() == 16 * 21
    b = out.agg(F.min("iy"), F.max("iy"), F.min("ix"), F.max("ix")).first()
    assert tuple(b) == (10, 30, 0, 15)
