"""Zonal goldens from `test/methods.jl:327-380`: the (1:26)*(1:31)' product
raster, sum == mask∘skipmissing identity, skipmissing=false semantics,
empty/out-of-bounds zones."""

import math

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.functions.geometry import Polygon
from rasters_jl_spark.grid import GridSpec
from rasters_jl_spark.operators.core import mask_geom
from rasters_jl_spark.operators.zonal import zonal_extent, zonal_raster

POLY_GRID = GridSpec(x0=-20.0, y0=0.0, dx=1.0, dy=1.0, nx=26, ny=31)
SQUARE = Polygon(1, ((-20.0, 30.0), (-20.0, 10.0), (0.0, 10.0), (0.0, 30.0)))
OUT_OF_BOUNDS = Polygon(9, ((-40.0, -40.0), (-40.0, -35.0), (-35.0, -35.0), (-35.0, -40.0)))


@pytest.fixture(scope="module")
def product_raster(spark):
    """a = (1:26) * (1:31)' — value = (ix+1)*(iy+1)."""
    xs = spark.range(26).select(F.col("id").cast("int").alias("ix"))
    ys = spark.range(31).select(F.col("id").cast("int").alias("iy"))
    return (
        xs.crossJoin(ys)
        .withColumn("value", ((F.col("ix") + 1) * (F.col("iy") + 1)).cast("double"))
        .cache()
    )


def test_zonal_sum_golden(product_raster):
    """zonal(sum, a; of=polygon) == sum(skipmissing(mask(a))) == 86100."""
    z = zonal_raster(product_raster, POLY_GRID, [SQUARE]).collect()[0]
    assert z["sum_val"] == 86100.0
    # identity against mask∘sum
    m = mask_geom(product_raster, POLY_GRID, [SQUARE], "center")
    assert m.agg(F.sum("value")).collect()[0][0] == z["sum_val"]


def test_zonal_extent_is_total(product_raster):
    """zonal over the raster's own extent == sum(a) (`test/methods.jl:340-343`)."""
    z = zonal_extent(product_raster, POLY_GRID, -30.0, 30.0, -5.0, 35.0).collect()[0]
    assert z["sum_val"] == sum(range(1, 27)) * sum(range(1, 32))


def test_zonal_skipmissing_false_is_missing(spark, product_raster):
    """With any missing in the crop box (incl. mask-created missings) the
    non-skipping reduce is missing (`test/methods.jl:358-365`)."""
    z = zonal_raster(product_raster, POLY_GRID, [SQUARE], skipmissing=False).collect()[0]
    # the 21×21 crop box contains 41 cells outside the 20×20 polygon
    assert z["sum_val"] is None


def test_zonal_out_of_bounds_polygon(product_raster):
    """Out-of-bounds geometry → missing result (`test/methods.jl:370-380`)."""
    rows = {
        r["geom_id"]: r
        for r in zonal_raster(product_raster, POLY_GRID, [SQUARE, OUT_OF_BOUNDS]).collect()
    }
    assert rows[1]["sum_val"] == 86100.0
    assert 9 not in rows or rows[9]["sum_val"] is None


def test_zonal_with_missing_data(spark):
    """Missing cells inside the zone are skipped (skipmissing=true)."""
    xs = spark.range(26).select(F.col("id").cast("int").alias("ix"))
    ys = spark.range(31).select(F.col("id").cast("int").alias("iy"))
    r = xs.crossJoin(ys).withColumn(
        "value",
        F.when(
            (F.col("ix") < 10) & (F.col("iy") >= 2) & (F.col("iy") <= 9), F.lit(None)
        ).otherwise(((F.col("ix") + 1) * (F.col("iy") + 1)).cast("double")),
    )
    z = zonal_raster(r, POLY_GRID, [SQUARE]).collect()[0]
    # missing band iy∈[2,9] is outside the polygon's iy∈[10,29] → unchanged
    assert z["sum_val"] == 86100.0
    z2 = zonal_raster(r, POLY_GRID, [SQUARE], skipmissing=False).collect()[0]
    assert z2["sum_val"] is None


def test_zonal_stack_layer_matches_zonal_raster(spark, sf_dir):
    """zonal_stack's layer-'a' slice equals zonal_raster on raster a —
    the per-layer stack form is the same reduction per geometry."""
    from pyspark.sql import functions as F

    from rasters_jl_spark import fixtures as FX
    from rasters_jl_spark.operators.zonal import zonal_raster, zonal_stack
    from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster

    a = synth_raster(spark, sf_dir, "a")
    stack = a.withColumn("layer", F.lit("a"))
    via_stack = {
        r["geom_id"]: (r["n_cells"], r["sum_val"], r["mean_val"])
        for r in zonal_stack(stack, RASTER_GRID, FX.RASTER_POLYS).collect()
    }
    via_raster = {
        r["geom_id"]: (r["n_cells"], r["sum_val"], r["mean_val"])
        for r in zonal_raster(a, RASTER_GRID, FX.RASTER_POLYS).collect()
    }
    assert via_stack == via_raster


def test_orientation_invariance_fwd_rev(spark, sf_dir):
    """Reversed-axis rasters (negative dx and/or dy — north-up GeoTIFF
    orientation) produce IDENTICAL operator output once mapped back to
    coordinate space: zonal, rasterize-shape extract, and boolmask all go
    through the signed-step block-cover join with no pre-normalization.
    Mirrors the reference's orientation-invariance tests
    (test/methods.jl:429-465, test/resample.jl:170-198)."""
    from rasters_jl_spark import fixtures as FX
    from rasters_jl_spark.grid import GridSpec
    from rasters_jl_spark.operators.extract import extract_polygons
    from rasters_jl_spark.operators.zonal import zonal_raster
    from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster

    g = RASTER_GRID
    base = synth_raster(spark, sf_dir, "a")
    want_zonal = {
        r["geom_id"]: (r["sum_val"], r["n_cells"])
        for r in zonal_raster(base, g, FX.RASTER_POLYS).collect()
    }
    # extract hits in COORDINATE space (orientation-independent frame)
    def coord_hits(raster, grid):
        return {
            (r["geom_id"], grid.x0 + r["ix"] * grid.dx, grid.y0 + r["iy"] * grid.dy, r["value"])
            for r in extract_polygons(raster, grid, FX.RASTER_POLYS).collect()
        }

    want_hits = coord_hits(base, g)
    for flip_x, flip_y in ((False, True), (True, False), (True, True)):
        fx = (F.lit(g.nx - 1) - F.col("ix")).cast("int") if flip_x else F.col("ix")
        fy = (F.lit(g.ny - 1) - F.col("iy")).cast("int") if flip_y else F.col("iy")
        flipped = base.select(fx.alias("ix"), fy.alias("iy"), "value")
        fg = GridSpec(
            x0=float(g.nx - 1) * g.dx + g.x0 if flip_x else g.x0,
            y0=float(g.ny - 1) * g.dy + g.y0 if flip_y else g.y0,
            dx=-g.dx if flip_x else g.dx,
            dy=-g.dy if flip_y else g.dy,
            nx=g.nx,
            ny=g.ny,
        )
        got_zonal = {
            r["geom_id"]: (r["sum_val"], r["n_cells"])
            for r in zonal_raster(flipped, fg, FX.RASTER_POLYS).collect()
        }
        assert got_zonal == want_zonal, (flip_x, flip_y)
        assert coord_hits(flipped, fg) == want_hits, (flip_x, flip_y)


def test_normalize_raster_roundtrip(spark, sf_dir):
    """normalize_raster maps an any-orientation raster onto its
    positive-step twin: same cell centers, same values."""
    from rasters_jl_spark.grid import GridSpec, normalize_raster
    from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster

    g = RASTER_GRID
    base = synth_raster(spark, sf_dir, "a")
    nu = base.select("ix", (F.lit(g.ny - 1) - F.col("iy")).cast("int").alias("iy"), "value")
    nug = GridSpec(g.x0, float(g.ny - 1) * g.dy + g.y0, g.dx, -g.dy, g.nx, g.ny)
    norm, ng = normalize_raster(nu, nug)
    assert ng.is_normalized and (ng.x0, ng.y0, ng.dx, ng.dy) == (g.x0, g.y0, g.dx, g.dy)
    assert sorted(map(tuple, norm.collect())) == sorted(map(tuple, base.collect()))
    # already-normalized input is returned untouched
    same, sg = normalize_raster(base, g)
    assert sg is g and same is base


def test_zonal_coverage_analytic_invariants(spark):
    """cov_cells == shoelace area / cell area exactly (analytic identity);
    constant raster → w_mean == the constant; plan is broadcast-only."""
    from pyspark.sql import functions as F

    from rasters_jl_spark.functions.geometry import Polygon
    from rasters_jl_spark.grid import GridSpec
    from rasters_jl_spark.operators.zonal import zonal_coverage

    g = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, nx=20, ny=20)
    cells = spark.range(400).select(
        (F.col("id") % 20).cast("int").alias("ix"),
        (F.col("id") / 20).cast("int").alias("iy"),
        F.lit(7.5).alias("value"),
    )
    polys = [
        Polygon(1, ((2.5, 4.5), (10.5, 4.5), (10.5, 12.5), (2.5, 12.5))),
        Polygon(2, ((1.2, 1.1), (8.7, 2.3), (7.4, 9.9), (4.2, 6.1), (0.8, 8.5))),
    ]

    def shoelace(ring):
        s = 0.0
        r = list(ring) + [ring[0]]
        for (x1, y1), (x2, y2) in zip(r, r[1:]):
            s += x1 * y2 - x2 * y1
        return abs(s) / 2.0

    out = {r["geom_id"]: r for r in zonal_coverage(cells, g, polys).collect()}
    assert out[1]["cov_cells"] == pytest.approx(shoelace(polys[0].ring), abs=1e-6)
    assert out[2]["cov_cells"] == pytest.approx(shoelace(polys[1].ring), abs=1e-6)
    # constant raster: weighted mean is the constant, w_sum = c * area
    assert out[1]["w_mean"] == pytest.approx(7.5, abs=1e-5)
    assert out[2]["w_mean"] == pytest.approx(7.5, abs=1e-5)
    assert out[1]["w_sum"] == pytest.approx(7.5 * shoelace(polys[0].ring), abs=1e-4)

    plan = zonal_coverage(cells, g, polys)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # block cover + edge table
