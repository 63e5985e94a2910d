"""Reference boundary-count goldens: 19²/20²/21² (`test/methods.jl:254-259`)
and the mask/boolmask complement invariants, on the reference's own
polytemplate grid X(-20:5) × Y(0:30), Intervals(Center)."""

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.functions.geometry import Polygon
from rasters_jl_spark.grid import GridSpec
from rasters_jl_spark.operators.core import boolmask, mask_geom

POLY_GRID = GridSpec(x0=-20.0, y0=0.0, dx=1.0, dy=1.0, nx=26, ny=31)
SQUARE = Polygon(1, ((-20.0, 30.0), (-20.0, 10.0), (0.0, 10.0), (0.0, 30.0)))


@pytest.fixture(scope="module")
def ones(spark):
    xs = spark.range(POLY_GRID.nx).select(F.col("id").cast("int").alias("ix"))
    ys = spark.range(POLY_GRID.ny).select(F.col("id").cast("int").alias("iy"))
    return xs.crossJoin(ys).withColumn("value", F.lit(1.0)).cache()


def _masked_sum(ones, boundary, invert=False):
    m = mask_geom(ones, POLY_GRID, [SQUARE], boundary=boundary, invert=invert)
    return m.agg(F.sum("value")).collect()[0][0] or 0.0


def test_boundary_center(ones):
    assert _masked_sum(ones, "center") == 20 * 20


def test_boundary_touches(ones):
    assert _masked_sum(ones, "touches") == 21 * 21


def test_boundary_inside(ones):
    assert _masked_sum(ones, "inside") == 19 * 19


@pytest.mark.parametrize("boundary,n", [("center", 400), ("touches", 441), ("inside", 361)])
def test_invert_complement(ones, boundary, n):
    """mask(invert) == complement (`test/methods.jl:241-259`)."""
    total = 26 * 31
    assert _masked_sum(ones, boundary, invert=True) == total - n


def test_boolmask_invert_is_negation(ones):
    """boolmask == .!boolmask(invert=true) (`test/methods.jl:98`)."""
    a = boolmask(ones, POLY_GRID, [SQUARE], "center")
    b = boolmask(ones, POLY_GRID, [SQUARE], "center", invert=True)
    j = a.withColumnRenamed("mask", "m1").join(
        b.withColumnRenamed("mask", "m2"), ["ix", "iy"]
    )
    assert j.where(F.col("m1") == F.col("m2")).count() == 0


def test_geometry_encompassing_raster(spark):
    """Polygon ⊇ raster → everything kept (`test/methods.jl:262-266`)."""
    g = GridSpec(x0=1.0, y0=1.0, dx=0.1, dy=0.1, nx=11, ny=11)
    xs = spark.range(g.nx).select(F.col("id").cast("int").alias("ix"))
    ys = spark.range(g.ny).select(F.col("id").cast("int").alias("iy"))
    ones = xs.crossJoin(ys).withColumn("value", F.lit(1.0))
    big = Polygon(1, ((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)))
    m = mask_geom(ones, g, [big], boundary="center")
    assert m.agg(F.sum("value")).collect()[0][0] == 121.0


def test_holed_polygon_mask_counts(spark, sf_dir):
    """14x14 outer square minus 6x6 hole on the unit grid: 196 - 36 = 160
    covered centers; hole interior classified outside by even-odd parity."""
    from rasters_jl_spark.operators.core import boolmask
    from rasters_jl_spark.queries_extra import HOLED_POLY
    from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster

    m = {(r["ix"], r["iy"]): r["mask"]
         for r in boolmask(synth_raster(spark, sf_dir, "a"), RASTER_GRID, [HOLED_POLY], "center").collect()}
    assert sum(m.values()) == 14 * 14 - 6 * 6
    assert m[(9, 9)] is False      # hole interior
    assert m[(5, 5)] is True       # ring between hole and outer
    assert m[(1, 1)] is False      # outside outer


def test_multipolygon_two_disjoint_components(spark, sf_dir):
    """One geometry, two disjoint 6x6 squares: both interiors inside
    (36 + 36 covered centers), the gap between them outside."""
    from rasters_jl_spark.operators.core import boolmask
    from rasters_jl_spark.queries_extra import MULTI_POLY
    from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster

    m = {(r["ix"], r["iy"]): r["mask"]
         for r in boolmask(synth_raster(spark, sf_dir, "a"), RASTER_GRID, [MULTI_POLY], "center").collect()}
    assert sum(m.values()) == 36 + 36
    assert m[(4, 4)] is True    # first component
    assert m[(14, 14)] is True  # second (disjoint) component
    assert m[(9, 9)] is False   # gap between them
