"""resample / cellarea / coverage — the numerically-delicate kernels.

resample re-expresses GDAL warp (`ext/RastersArchGDALExt/resample.jl:9-124`)
as joins: every target cell computes its source coordinate by inverse affine
(pure column math), then

- ``near``: floor to the owning source cell → one equi hash join. Floor on
  the half-cell-shifted coordinate avoids round-half ambiguity entirely —
  deterministic in both Spark and the DuckDB oracle.
- ``bilinear``: four *explicit* neighbor joins (v00,v10,v01,v11) combined in
  a fixed-order weighted expression. Four joins instead of explode+groupBy
  keeps the floating-point summation order deterministic — the engine's
  answer to the reference's bit-stability requirement
  (`test/resample.jl:16-27` matches gdalwarp bit-for-bit). Missing source
  cells are skipped and weights renormalised; all-missing → NULL.
- aggregate methods (average/sum/min/max): every source cell maps to the
  target cell containing its center → groupBy (used when downscaling).

cellarea: closed-form spherical latitude-band area
(`ext/RastersProjExt/cellarea.jl:56-65`): 2πR²(sin y₂ − sin y₁)·Δx/360.

coverage_rect: exact analytic polygon∩cell area fraction for axis-aligned
rectangles (`src/methods/coverage.jl` computes this by scale² subpixel
counting; the closed form is exact, cheaper, and SQL-expressible).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rasters_jl_spark.grid import GridSpec

EARTH_R_KM = 6371.0088

# 2/3 written once so the Spark and SQL kernels share the exact double
TWO_THIRDS = 2.0 / 3.0


def cubic_w_col(t):
    """Keys bicubic convolution kernel, a = -0.5 (the gdalwarp `cubic`
    method, `src/extensions.jl:59-75`). Horner form — the DuckDB oracle
    uses the identical arithmetic string."""
    at = F.abs(t)
    return (
        F.when(at <= 1.0, (F.lit(1.5) * at - F.lit(2.5)) * at * at + F.lit(1.0))
        .when(at < 2.0, F.lit(-0.5) * (((at - F.lit(5.0)) * at + F.lit(8.0)) * at - F.lit(4.0)))
        .otherwise(F.lit(0.0))
    )


def cubicspline_w_col(t):
    """Cubic B-spline kernel (gdalwarp `cubicspline`)."""
    at = F.abs(t)
    b = F.lit(2.0) - at
    return (
        F.when(at <= 1.0, (F.lit(0.5) * at - F.lit(1.0)) * at * at + F.lit(TWO_THIRDS))
        .when(at < 2.0, b * b * b / F.lit(6.0))
        .otherwise(F.lit(0.0))
    )


LANCZOS_A = 3  # gdalwarp lanczos window (6×6 stencil)


def lanczos_w_col(t):
    """Lanczos windowed sinc, a = 3 (gdalwarp `lanczos`): sinc(t)·sinc(t/a)
    for |t| < a, 1 at t = 0."""
    at = F.abs(t)
    pt = F.lit(math.pi) * t
    pta = pt / F.lit(float(LANCZOS_A))
    return (
        F.when(at < 1e-12, F.lit(1.0))
        .when(at < float(LANCZOS_A), (F.sin(pt) / pt) * (F.sin(pta) / pta))
        .otherwise(F.lit(0.0))
    )


# stencil offsets per kernel: weights are zero outside |t| < support, and
# t = di - frac with frac ∈ [0, 1)
KERNEL_OFFSETS = {
    "cubic": (-1, 0, 1, 2),
    "cubicspline": (-1, 0, 1, 2),
    "lanczos": (-2, -1, 0, 1, 2, 3),
}


def cubic_w_sql(a: str, method: str, t: str = None) -> str:
    """Identical arithmetic as the Column kernels, as SQL text; ``a`` is an
    expression for ABS(t) (lanczos also needs the signed ``t``)."""
    if method == "cubic":
        return (
            f"CASE WHEN {a} <= 1.0 THEN (1.5 * {a} - 2.5) * {a} * {a} + 1.0 "
            f"WHEN {a} < 2.0 THEN -0.5 * ((({a} - 5.0) * {a} + 8.0) * {a} - 4.0) "
            f"ELSE 0.0 END"
        )
    if method == "lanczos":
        pt = f"({math.pi!r} * {t})"
        pta = f"({pt} / {float(LANCZOS_A)!r})"
        return (
            f"CASE WHEN {a} < 1e-12 THEN 1.0 "
            f"WHEN {a} < {float(LANCZOS_A)!r} THEN (SIN({pt}) / {pt}) * (SIN({pta}) / {pta}) "
            f"ELSE 0.0 END"
        )
    return (
        f"CASE WHEN {a} <= 1.0 THEN (0.5 * {a} - 1.0) * {a} * {a} + {TWO_THIRDS!r} "
        f"WHEN {a} < 2.0 THEN (2.0 - {a}) * (2.0 - {a}) * (2.0 - {a}) / 6.0 "
        f"ELSE 0.0 END"
    )


def _target_cells(spark, tgt: GridSpec) -> DataFrame:
    xs = spark.range(0, tgt.nx).select(F.col("id").cast("int").alias("jx"))
    ys = spark.range(0, tgt.ny).select(F.col("id").cast("int").alias("jy"))
    return xs.crossJoin(ys)


def resample(
    raster: DataFrame,
    src: GridSpec,
    tgt: GridSpec,
    method: str = "near",
) -> DataFrame:
    """Regrid ``raster`` from ``src`` onto ``tgt``. Returns (ix, iy, value)
    indexed on the target grid."""
    spark = raster.sparkSession
    cells = _target_cells(spark, tgt)
    xt = tgt.x_col(F.col("jx"))
    yt = tgt.y_col(F.col("jy"))

    if method == "near":
        sx = src.ix_of_x_col(xt)
        sy = src.iy_of_y_col(yt)
        t = cells.select(
            F.col("jx").alias("ix"), F.col("jy").alias("iy"), sx.alias("_sx"), sy.alias("_sy")
        ).where(src.in_bounds_col(F.col("_sx"), F.col("_sy")))
        r = raster.select(
            F.col("ix").alias("_sx"), F.col("iy").alias("_sy"), F.col("value")
        )
        return t.join(r, ["_sx", "_sy"], "left").select("ix", "iy", "value")

    if method == "bilinear":
        fx = (xt - F.lit(src.x0)) / F.lit(src.dx)
        fy = (yt - F.lit(src.y0)) / F.lit(src.dy)
        t = cells.select(
            F.col("jx").alias("ix"),
            F.col("jy").alias("iy"),
            F.floor(fx).cast("int").alias("_x0"),
            F.floor(fy).cast("int").alias("_y0"),
            (fx - F.floor(fx)).alias("_wx"),
            (fy - F.floor(fy)).alias("_wy"),
        )
        out = t
        for tag, (ddx, ddy) in {"00": (0, 0), "10": (1, 0), "01": (0, 1), "11": (1, 1)}.items():
            r = raster.select(
                (F.col("ix") - ddx).alias("_x0"),
                (F.col("iy") - ddy).alias("_y0"),
                F.col("value").alias(f"_v{tag}"),
            )
            out = out.join(r, ["_x0", "_y0"], "left")
        wx, wy = F.col("_wx"), F.col("_wy")
        w00 = (1 - wx) * (1 - wy)
        w10 = wx * (1 - wy)
        w01 = (1 - wx) * wy
        w11 = wx * wy
        num = F.lit(0.0)
        den = F.lit(0.0)
        for tag, w in (("00", w00), ("10", w10), ("01", w01), ("11", w11)):
            v = F.col(f"_v{tag}")
            num = num + F.when(v.isNotNull(), w * v).otherwise(F.lit(0.0))
            den = den + F.when(v.isNotNull(), w).otherwise(F.lit(0.0))
        val = F.when(den > 0, num / den).otherwise(F.lit(None))
        return out.select("ix", "iy", val.alias("value"))

    if method in ("cubic", "cubicspline", "lanczos"):
        # k×k stencil (4×4 cubic family, 6×6 lanczos): explode the (di, dj)
        # offsets per target cell, ONE equi left join to the source raster,
        # groupBy(target) with missing-skipping weight renormalisation
        # (same discipline as bilinear). One shuffle; the fan-out is narrow.
        wfun = {
            "cubic": cubic_w_col,
            "cubicspline": cubicspline_w_col,
            "lanczos": lanczos_w_col,
        }[method]
        fx = (xt - F.lit(src.x0)) / F.lit(src.dx)
        fy = (yt - F.lit(src.y0)) / F.lit(src.dy)
        t = cells.select(
            F.col("jx").alias("ix"),
            F.col("jy").alias("iy"),
            F.floor(fx).cast("int").alias("_x0"),
            F.floor(fy).cast("int").alias("_y0"),
            (fx - F.floor(fx)).alias("_wx"),
            (fy - F.floor(fy)).alias("_wy"),
        )
        offs = F.array(*[F.lit(i) for i in KERNEL_OFFSETS[method]])
        n = t.select("*", F.explode(offs).alias("_di"))
        n = n.select("*", F.explode(offs).alias("_dj"))
        n = n.withColumn("_sx", (F.col("_x0") + F.col("_di")).cast("int")).withColumn(
            "_sy", (F.col("_y0") + F.col("_dj")).cast("int")
        )
        r = raster.select(
            F.col("ix").alias("_sx"), F.col("iy").alias("_sy"), F.col("value")
        )
        j = n.join(r, ["_sx", "_sy"], "left")
        w = wfun(F.col("_di").cast("double") - F.col("_wx")) * wfun(
            F.col("_dj").cast("double") - F.col("_wy")
        )
        v = F.col("value")
        agg = j.groupBy("ix", "iy").agg(
            F.sum(F.when(v.isNotNull(), w * v).otherwise(F.lit(0.0))).alias("_num"),
            F.sum(F.when(v.isNotNull(), w).otherwise(F.lit(0.0))).alias("_den"),
            F.count(v).alias("_cnt"),
        )
        out_v = F.when(
            (F.col("_cnt") > 0) & (F.col("_den") != 0.0), F.col("_num") / F.col("_den")
        )
        return agg.select("ix", "iy", out_v.alias("value"))

    if method in ("average", "sum", "min", "max", "count", "med", "q1", "q3", "mode", "rms"):
        # downscale: source cell center → owning target cell, groupBy
        # (full GDAL -r aggregate surface, `src/extensions.jl:59-75`)
        sx = src.x_col(F.col("ix"))
        sy = src.y_col(F.col("iy"))
        mapped = raster.select(
            tgt.ix_of_x_col(sx).alias("tix"), tgt.iy_of_y_col(sy).alias("tiy"), "value"
        ).where(tgt.in_bounds_col(F.col("tix"), F.col("tiy")))
        mapped = mapped.select(F.col("tix").alias("ix"), F.col("tiy").alias("iy"), "value")
        if method == "mode":
            from rasters_jl_spark.operators.aggregate import _aggregate_mode

            return _aggregate_mode(mapped, 1, skipmissing=True)
        red = {
            "average": F.avg,
            "sum": F.sum,
            "min": F.min,
            "max": F.max,
            "count": F.count,
            "med": lambda c: F.percentile(c, F.lit(0.5)),
            "q1": lambda c: F.percentile(c, F.lit(0.25)),
            "q3": lambda c: F.percentile(c, F.lit(0.75)),
            # gdalwarp -r rms: sqrt of the mean of squares
            "rms": lambda c: F.sqrt(F.avg(F.col(c) * F.col(c))),
        }[method]
        return mapped.groupBy("ix", "iy").agg(red("value").cast("double").alias("value"))

    raise ValueError(f"unknown method {method!r}")


def cellarea(spark, grid: GridSpec, radius_km: float = EARTH_R_KM) -> DataFrame:
    """(ix, iy, area_km2): spherical latitude-band cell area. Pure column
    math over the generated index space — needs no data at all
    (`ext/RastersProjExt/cellarea.jl:56-65`)."""
    cells = _target_cells(spark, grid).select(
        F.col("jx").alias("ix"), F.col("jy").alias("iy")
    )
    y = grid.y_col(F.col("iy"))
    # |dy|: on a north-up grid (dy<0) the band edges would otherwise swap
    # and every area would come out negative
    y1 = F.radians(y - F.lit(abs(grid.dy) / 2.0))
    y2 = F.radians(y + F.lit(abs(grid.dy) / 2.0))
    area = (
        F.lit(2.0 * math.pi * radius_km * radius_km)
        * (F.sin(y2) - F.sin(y1))
        * F.lit(abs(grid.dx) / 360.0)
    )
    return cells.select("ix", "iy", area.alias("area_km2"))


def cellarea_planar(spark, grid: GridSpec) -> DataFrame:
    """(ix, iy, area): Planar method — |dx|·|dy| in CRS units, constant per
    cell (reference `Planar()` path, `src/extensions.jl:242-245`
    `_planar_cellarea` = interval width product). Kept per-cell-shaped for
    API parity with the spherical methods."""
    cells = _target_cells(spark, grid).select(
        F.col("jx").alias("ix"), F.col("jy").alias("iy")
    )
    return cells.select("ix", "iy", F.lit(abs(grid.dx) * abs(grid.dy)).alias("area"))


# Spherical-quadrilateral cell area (projected-CRS path of the reference,
# `ext/RastersProjExt/cellarea.jl:23-47,67-107`): each cell's corner ring is
# mapped to unit-sphere points and split into two spherical triangles via
# Eriksson's formula (t = |a·((b−a)×(c−a))| / ((b+a)·(c+a)), area = 2·atan t).
# The formula is built ONCE as SQL text and evaluated with F.expr in Spark
# and verbatim in the DuckDB oracle — sin/cos/atan/radians are shared SQL,
# so the two engines run the identical expression tree (the engine's
# CRS→lon/lat `transform` hook is identity here: aligned-axes scope).
def _sph_point_exprs(tag: str, lon_col: str, lat_col: str) -> list[tuple[str, str]]:
    return [
        (f"{tag}x", f"cos(radians({lat_col})) * cos(radians({lon_col}))"),
        (f"{tag}y", f"cos(radians({lat_col})) * sin(radians({lon_col}))"),
        (f"{tag}z", f"sin(radians({lat_col}))"),
    ]


def _eriksson_tri_expr(a: str, b: str, c: str) -> str:
    num = (
        f"({a}x*(({b}y-{a}y)*({c}z-{a}z) - ({b}z-{a}z)*({c}y-{a}y))"
        f" + {a}y*(({b}z-{a}z)*({c}x-{a}x) - ({b}x-{a}x)*({c}z-{a}z))"
        f" + {a}z*(({b}x-{a}x)*({c}y-{a}y) - ({b}y-{a}y)*({c}x-{a}x)))"
    )
    den = (
        f"(({b}x+{a}x)*({c}x+{a}x) + ({b}y+{a}y)*({c}y+{a}y)"
        f" + ({b}z+{a}z)*({c}z+{a}z))"
    )
    return f"2.0 * atan(abs({num} / {den}))"


QUAD_CORNER_EXPRS: list[tuple[str, str]] = (
    _sph_point_exprs("p1", "cx1", "cy1")
    + _sph_point_exprs("p2", "cx2", "cy1")
    + _sph_point_exprs("p3", "cx2", "cy2")
    + _sph_point_exprs("p4", "cx1", "cy2")
)
QUAD_AREA_EXPR = f"({_eriksson_tri_expr('p1', 'p2', 'p3')}) + ({_eriksson_tri_expr('p3', 'p4', 'p1')})"


def cellarea_quad(spark, grid: GridSpec, radius_km: float = EARTH_R_KM) -> DataFrame:
    """(ix, iy, area_km2): spherical-QUADRILATERAL cell area — the
    reference's projected-CRS method, exact for any cell whose corners are
    known in lon/lat (the lat-band closed form only holds for lon/lat-
    aligned rectangles). Pure codegen column math per cell."""
    cells = _target_cells(spark, grid).select(
        F.col("jx").alias("ix"), F.col("jy").alias("iy")
    )
    out = (
        cells.withColumn("cx1", grid.x_col(F.col("ix")) - F.lit(grid.dx / 2.0))
        .withColumn("cx2", grid.x_col(F.col("ix")) + F.lit(grid.dx / 2.0))
        .withColumn("cy1", grid.y_col(F.col("iy")) - F.lit(grid.dy / 2.0))
        .withColumn("cy2", grid.y_col(F.col("iy")) + F.lit(grid.dy / 2.0))
    )
    for name, expr in QUAD_CORNER_EXPRS:
        out = out.withColumn(name, F.expr(expr))
    area = F.expr(QUAD_AREA_EXPR) * F.lit(radius_km * radius_km)
    return out.select("ix", "iy", area.alias("area_km2"))


def coverage_rect(
    raster_universe: DataFrame,
    grid: GridSpec,
    rects: list[tuple[int, float, float, float, float]],
    mode: str = "sum",
) -> DataFrame:
    """Fraction [0,1] of each cell covered by axis-aligned rectangles.

    ``rects``: (geom_id, xmin, xmax, ymin, ymax). Exact closed form:
    overlap = max(0, min(cx+d/2, xmax) - max(cx-d/2, xmin)) per axis.
    mode='sum' adds fractions across geoms (`src/methods/coverage.jl:46-117`
    mode=sum); mode='union' is exact for non-overlapping rects and clamps
    to 1.0 otherwise.
    """
    cx = grid.x_col(F.col("ix"))
    cy = grid.y_col(F.col("iy"))
    hdx, hdy = grid.dx / 2.0, grid.dy / 2.0
    total = F.lit(0.0)
    for _gid, xmin, xmax, ymin, ymax in rects:
        ox = F.greatest(
            F.lit(0.0), F.least(cx + hdx, F.lit(xmax)) - F.greatest(cx - hdx, F.lit(xmin))
        )
        oy = F.greatest(
            F.lit(0.0), F.least(cy + hdy, F.lit(ymax)) - F.greatest(cy - hdy, F.lit(ymin))
        )
        total = total + (ox * oy) / F.lit(grid.dx * grid.dy)
    if mode == "union":
        total = F.least(total, F.lit(1.0))
    return raster_universe.select("ix", "iy", total.alias("coverage"))


def coverage_polygons(
    raster_universe: DataFrame,
    grid: GridSpec,
    polys,
    mode: str = "union",
    scale: int = 10,
) -> DataFrame:
    """GENERAL-polygon coverage: fraction [0,1] of each cell covered,
    reference-faithful scale² subpixel counting with an even-odd PIP test
    per subpixel center (`src/methods/coverage.jl:46-117`, burn kernels
    `:120-397`). mode='union' counts subcells inside ANY geometry;
    mode='sum' adds per-geometry counts (overlaps count multiply).

    Plan: only cells NEAR geometry explode — candidates come from the
    broadcast block-cover join (``raster_geom_candidates`` with the
    touches-padded cover; the unused cell-level predicate is pruned by
    Catalyst), each candidate fans out scale² subpixel centers tested by
    the codegen'd PIP over the joined edge array, one groupBy(cell)
    partial-aggregates map-side, and the universe left-join restores
    zero-coverage cells. At 100× data the subpixel explode never touches
    the (vast) empty part of the raster.
    """
    from rasters_jl_spark.functions.geometry import pip_col
    from rasters_jl_spark.operators.zonal import raster_geom_candidates

    cand = raster_geom_candidates(
        raster_universe.select("ix", "iy"), grid, polys, boundary="touches", keep_arrays=True
    ).select("ix", "iy", "geom_id", "edges")
    sub = F.sequence(F.lit(0), F.lit(scale - 1))
    df = cand.select("ix", "iy", "geom_id", "edges", F.explode(sub).alias("u"))
    df = df.select("ix", "iy", "geom_id", "edges", "u", F.explode(sub).alias("v"))
    hdx, hdy = grid.dx / 2.0, grid.dy / 2.0
    sub_x, sub_y = grid.dx / scale, grid.dy / scale
    px = grid.x_col(F.col("ix")) - F.lit(hdx) + (F.col("u").cast("double") + F.lit(0.5)) * F.lit(sub_x)
    py = grid.y_col(F.col("iy")) - F.lit(hdy) + (F.col("v").cast("double") + F.lit(0.5)) * F.lit(sub_y)
    hits = df.where(pip_col(px, py, F.col("edges")))
    if mode == "union":
        agg = F.count_distinct(F.col("u") * scale + F.col("v"))
    elif mode == "sum":
        agg = F.count(F.lit(1))
    else:
        raise ValueError(f"mode must be union|sum, got {mode!r}")
    per_cell = hits.groupBy("ix", "iy").agg(
        (agg.cast("double") / F.lit(float(scale * scale))).alias("_cov")
    )
    return raster_universe.select("ix", "iy").join(per_cell, ["ix", "iy"], "left").select(
        "ix", "iy", F.coalesce(F.col("_cov"), F.lit(0.0)).alias("coverage")
    )


def coverage_clipped(
    raster_universe: DataFrame,
    grid: GridSpec,
    polys,
    mode: str = "sum",
) -> DataFrame:
    """EXACT general-polygon coverage — the analytic alternative to the
    reference's scale² subpixel counting (`src/methods/coverage.jl:46-117`;
    SURVEY §2.4 names the clipped-area form as the better Spark plan): the
    fraction of each cell covered by each simple ring is the CLOSED-FORM
    clipped area via per-edge clamped Green's-theorem integrals
    (`functions/geometry.py::clip_area_edge_col`) — equivalent to
    Sutherland–Hodgman clipping + shoelace but EDGE-INDEPENDENT, so it
    unrolls to pure whole-stage-codegen column math: no subpixel explode,
    no groupBy, ZERO shuffles (the subpixel path fans out scale² = 100 rows
    per candidate and re-groups them; this emits one expression per cell).

    mode='sum' adds per-ring |area|/cellarea (orientation-robust via the
    abs; holes would need opposite winding — the fixture rings are solid).
    Exact where the subpixel path approximates: converges to this as
    scale→∞. Unrolled per-geometry literals (the coverage_rect pattern) —
    for catalogs of many polygons use :func:`coverage_polygons`' candidate
    join instead."""
    if mode != "sum":
        raise ValueError(f"coverage_clipped supports mode='sum', got {mode!r}")
    cx = grid.x_col(F.col("ix"))
    cy = grid.y_col(F.col("iy"))
    hdx, hdy = grid.dx / 2.0, grid.dy / 2.0
    x0, x1 = cx - F.lit(hdx), cx + F.lit(hdx)
    y0, y1 = cy - F.lit(hdy), cy + F.lit(hdy)
    from rasters_jl_spark.functions.geometry import clip_area_edge_col

    total = F.lit(0.0)
    for p in polys:
        signed = F.lit(0.0)
        for e in p.edges:
            signed = signed + clip_area_edge_col(e, x0, x1, y0, y1)
        total = total + F.abs(signed)
    cov = total / F.lit(grid.dx * grid.dy)
    return raster_universe.select("ix", "iy", cov.alias("coverage"))


def coverage_subpixel(
    raster_universe: DataFrame,
    grid: GridSpec,
    rects: list[tuple[int, float, float, float, float]],
    mode: str = "union",
    scale: int = 10,
) -> DataFrame:
    """Reference-faithful coverage by scale² subpixel counting
    (`src/methods/coverage.jl:46-117`): each cell is divided into
    scale×scale subcells; a subcell counts when its center lies in a
    rect (half-open [min, max) edges). mode='union' counts subcells
    covered by ANY geom — exact for overlapping geoms, where the
    closed-form :func:`coverage_rect` union can only clamp; mode='sum'
    adds per-geom counts.

    Plan shape: two sequence-explodes (×scale²) stay narrow; the
    groupBy(ix, iy) partial-aggregates map-side, so the shuffle carries
    one row per cell, not per subcell.
    """
    sub_x, sub_y = grid.dx / scale, grid.dy / scale
    hdx, hdy = grid.dx / 2.0, grid.dy / 2.0
    sub = F.sequence(F.lit(0), F.lit(scale - 1))
    df = raster_universe.select("ix", "iy", F.explode(sub).alias("u"))
    df = df.select("ix", "iy", "u", F.explode(sub).alias("v"))
    px = grid.x_col(F.col("ix")) - F.lit(hdx) + (F.col("u").cast("double") + F.lit(0.5)) * F.lit(sub_x)
    py = grid.y_col(F.col("iy")) - F.lit(hdy) + (F.col("v").cast("double") + F.lit(0.5)) * F.lit(sub_y)

    def inside(r):
        _gid, xmin, xmax, ymin, ymax = r
        return (px >= F.lit(xmin)) & (px < F.lit(xmax)) & (py >= F.lit(ymin)) & (py < F.lit(ymax))

    if mode == "union":
        cond = F.lit(False)
        for r in rects:
            cond = cond | inside(r)
        covered = cond.cast("int")
    elif mode == "sum":
        covered = F.lit(0)
        for r in rects:
            covered = covered + inside(r).cast("int")
    else:
        raise ValueError(f"mode must be union|sum, got {mode!r}")
    return df.groupBy("ix", "iy").agg(
        (F.sum(covered).cast("double") / F.lit(float(scale * scale))).alias("coverage")
    )
