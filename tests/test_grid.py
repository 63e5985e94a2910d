"""Grid math: cell assignment, hierarchy, rings, reversed-order lookups."""

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.grid import GridSpec, WebGrid


def test_webgrid_cell_assignment(spark):
    g = WebGrid(3)  # 16 x 8 cells of 22.5 deg
    df = spark.createDataFrame(
        [(-180.0, -90.0), (0.0, 0.0), (179.9, 89.9), (-0.1, -0.1)], "lon double, lat double"
    )
    out = df.select(
        g.ix_col(F.col("lon")).alias("ix"),
        g.iy_col(F.col("lat")).alias("iy"),
        g.cell_col(F.col("lon"), F.col("lat")).alias("cell"),
    ).collect()
    assert (out[0]["ix"], out[0]["iy"]) == (0, 0)
    assert (out[1]["ix"], out[1]["iy"]) == (8, 4)
    assert (out[2]["ix"], out[2]["iy"]) == (15, 7)
    assert (out[3]["ix"], out[3]["iy"]) == (7, 3)
    assert out[1]["cell"] == 4 * 16 + 8


def test_webgrid_parent_consistency(spark):
    fine, coarse = WebGrid(6), WebGrid(3)
    df = spark.createDataFrame([(float(x), float(y)) for x in range(-175, 180, 35) for y in range(-85, 90, 35)], "lon double, lat double")
    out = df.select(
        fine.parent_cell_col(fine.cell_col(F.col("lon"), F.col("lat")), 3).alias("parent"),
        coarse.cell_col(F.col("lon"), F.col("lat")).alias("direct"),
    )
    assert out.where(F.col("parent") != F.col("direct")).count() == 0


def test_ring_cells(spark):
    g = WebGrid(3)
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    cells = df.select(
        F.size(g.ring_cells_col(g.cell_col(F.col("lon"), F.col("lat")), F.lit(1))).alias("n")
    ).collect()[0]["n"]
    assert cells == 9
    # corner cell: ring clipped at the grid boundary (planar, no wrap)
    df2 = spark.createDataFrame([(-179.9, -89.9)], "lon double, lat double")
    n2 = df2.select(
        F.size(g.ring_cells_col(g.cell_col(F.col("lon"), F.col("lat")), F.lit(1))).alias("n")
    ).collect()[0]["n"]
    assert n2 == 4


def test_gridspec_point_ownership(spark):
    g = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, nx=4, ny=4)
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.49, 0.0), (0.5, 0.0), (-0.5, 0.0), (-0.51, 0.0)], "x double, y double"
    )
    out = [r["ix"] for r in df.select(g.ix_of_x_col(F.col("x")).alias("ix")).collect()]
    # half-open [center-0.5, center+0.5)
    assert out == [0, 0, 1, 0, -1]


def test_gridspec_reverse_ordered(spark):
    """The reference supports reverse-ordered lookups (X(10.0:-1.0:9.0),
    `test/extract.jl:7-13`); negative dx handles them natively."""
    g = GridSpec(x0=10.0, y0=0.1, dx=-1.0, dy=0.1, nx=2, ny=2)
    df = spark.createDataFrame([(10.0, 0.1), (9.0, 0.2), (9.2, 0.13)], "x double, y double")
    out = df.select(
        g.ix_of_x_col(F.col("x")).alias("ix"), g.iy_of_y_col(F.col("y")).alias("iy")
    ).collect()
    assert (out[0]["ix"], out[0]["iy"]) == (0, 0)
    assert (out[1]["ix"], out[1]["iy"]) == (1, 1)
    assert (out[2]["ix"], out[2]["iy"]) == (1, 0)


def test_irregular_from_centers_and_bucketed_assign(spark):
    """Irregular bounds inference (midpoints) matches hand math, and the
    bucketed interval hash join assigns exactly what a brute scan does —
    including dropping out-of-grid points."""
    from rasters_jl_spark.lookup import ExplicitAxis

    ax = ExplicitAxis.from_centers([0.0, 1.0, 3.0, 7.0])
    assert ax.bounds == ((-0.5, 0.5), (0.5, 2.0), (2.0, 5.0), (5.0, 9.0))

    pts = spark.range(200).select(
        F.col("id").alias("pt_id"), ((F.col("id") * 37 % 230) / 20.0 - 1.0).alias("x")
    )
    got = {(r["pt_id"], r["ix"]) for r in ax.assign(pts, "x", "ix").collect()}
    want = set()
    for r in pts.collect():
        for i, (lo, hi) in enumerate(ax.bounds):
            if lo <= r["x"] < hi:
                want.add((r["pt_id"], i))
    assert got == want
    assert len(got) < 200  # some points fell outside and were dropped


def test_irregular_descending_centers_and_validation(spark):
    """from_centers on a DESCENDING vector (north-up NetCDF lat axis) keeps
    index i owned by centers[i] with ascending (lo, hi); inverted explicit
    bounds raise instead of silently dropping every point."""
    from rasters_jl_spark.lookup import ExplicitAxis

    ax = ExplicitAxis.from_centers([10.0, 8.0, 6.0])
    assert ax.bounds == ((9.0, 11.0), (7.0, 9.0), (5.0, 7.0))
    pts = spark.createDataFrame([(0, 10.5), (1, 8.0), (2, 5.5), (3, 20.0)], "pt_id int, x double")
    got = {(r["pt_id"], r["i"]) for r in ax.assign(pts, "x", "i").collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}  # pt 3 out of axis -> dropped

    with pytest.raises(ValueError, match="lo >= hi"):
        ExplicitAxis(((2.0, 1.0),))
    with pytest.raises(ValueError, match="monotonic"):
        ExplicitAxis.from_centers([1.0, 3.0, 2.0])


def test_explicit_assign_rejects_reserved_columns(spark):
    """Input columns colliding with ExplicitAxis.assign internals (_bk/_lo/
    _hi or the target index name) raise instead of being silently clobbered."""
    import pytest

    from rasters_jl_spark.lookup import ExplicitAxis

    ax = ExplicitAxis(((0.0, 1.0), (1.0, 2.5)))
    bad = spark.createDataFrame([(0.5, 7)], "x double, _bk int")
    with pytest.raises(ValueError, match="_bk"):
        ax.assign(bad, "x", "ix")
    bad2 = spark.createDataFrame([(0.5, 7)], "x double, ix int")
    with pytest.raises(ValueError, match="ix"):
        ax.assign(bad2, "x", "ix")
