"""zonal — the flagship: per-geometry statistics.

Reference: `zonal(f, x; of=geoms)` (`src/methods/zonal.jl:67-165`) = per
geometry crop → mask → reduce-skipmissing, threaded over geometries. The
Spark plan is ONE job over all geometries:

    pages ⋈ polygon-cover (equi hash join on coarse cell — broadcast)
          → PIP refine (codegen'd higher-order expr over edge arrays)
          → groupBy(geom_id).agg(...)
          → left join back to polygons (empty zones, `emptyval`)

`skipmissing=true` is Spark's NULL-ignoring aggregation; `skipmissing=false`
adds a has-null guard in the same pass (`src/methods/zonal.jl:155-165`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rasters_jl_spark.functions.geometry import (
    FUSE_EDGE_STRUCTS_MAX,
    Polygon,
    _cover_cell_count,
    boundary_pred,
    pip_col,
    polygon_block_cover_df,
    polygon_cover_df,
    polygon_cover_edges_df,
    polygons_df,
)
from rasters_jl_spark.grid import COVER_RES, GridSpec, WebGrid

GEOM_BLOCK = 16  # raster cells per cover-block edge for the single-scan join


def spatial_join_pages(
    pages: DataFrame,
    polys: list[Polygon],
    cover_res: int = COVER_RES,
    n_salt: int = 1,
    use_pandas_pip: bool = False,
) -> DataFrame:
    """pages × polygons inner join on point-in-polygon.

    The cell-prefix hash join: pages carry a precomputed fine cell; the
    polygon side is exploded to coarse cover cells and **broadcast** (the
    geometry side is metadata-scale). The equi join on the coarse cell does
    the candidate reduction (the reference's extent pre-filter,
    `src/methods/burning/geometry.jl:96-104`); PIP refines exactly.

    Returns pages columns + ``geom_id``. With ``n_salt>1`` the page side
    appends ``doc_id % n_salt`` to the join key and the cover side is
    replicated per salt — identical row set, hot cells spread over salt
    partitions (verified by `tests/test_skew.py`).
    """
    spark = pages.sparkSession
    g = WebGrid(cover_res)
    # Fuse the edge arrays ONTO the cover rows when the duplication is
    # bounded (each cover cell row repeats its polygon's edge array): one
    # broadcast build + one hash-join probe per page instead of two.
    # Past the bound (huge multi-polygon zonals where cells-per-geom ×
    # edges would inflate the broadcast), fall back to the two-join form —
    # same rows either way, purely a physical-plan choice.
    n_cover_cells = _cover_cell_count(polys, g)
    fuse = n_cover_cells * max(len(p.edges) for p in polys) * max(n_salt, 1) <= FUSE_EDGE_STRUCTS_MAX
    if fuse:
        cover = polygon_cover_edges_df(spark, polys, cover_res, n_salt=n_salt)
    else:
        cover = polygon_cover_df(spark, polys, cover_res, n_salt=n_salt)

    p = pages.withColumn("_cover_cell", g.cell_col(F.col("lon"), F.col("lat")))
    if n_salt > 1:
        p = p.withColumn("_salt", (F.col("doc_id") % n_salt).cast("int"))
        cand = p.join(
            F.broadcast(cover),
            (p["_cover_cell"] == cover["cover_cell"]) & (p["_salt"] == cover["salt"]),
        ).drop("cover_cell", "salt", "_salt")
    else:
        cand = p.join(F.broadcast(cover), p["_cover_cell"] == cover["cover_cell"]).drop(
            "cover_cell"
        )
    if not fuse:
        pdf = polygons_df(spark, polys).select(
            "geom_id", "edges", "xmin", "xmax", "ymin", "ymax"
        )
        cand = cand.join(F.broadcast(pdf), "geom_id")
    if use_pandas_pip:
        from rasters_jl_spark.functions.geometry import pip_pandas_udf

        pip = pip_pandas_udf(polys)
        refined = cand.where(pip(F.col("lon"), F.col("lat"), F.col("geom_id")))
    else:
        refined = cand.where(pip_col(F.col("lon"), F.col("lat"), F.col("edges")))
    # fixed output order (geom_id first, then the caller's page columns) —
    # identical for the fused and two-join physical forms
    return refined.select("geom_id", *pages.columns)


def zonal_pages(
    pages: DataFrame,
    polys: list[Polygon],
    value_col: str = "n_chars",
    cover_res: int = COVER_RES,
    n_salt: int = 1,
    emptyval=None,
) -> DataFrame:
    """Per-polygon count / sum / mean / min / max of a page metric.

    Empty zones come back with count 0 and NULL stats (the reference's
    ``missing`` default; `emptyval` overrides, `src/methods/zonal.jl:133-152`).
    """
    joined = spatial_join_pages(pages, polys, cover_res, n_salt=n_salt)
    v = F.col(value_col)
    agg = joined.groupBy("geom_id").agg(
        F.count(v).alias("n_pages"),
        F.sum(v).alias("sum_val"),
        F.avg(v).alias("mean_val"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )
    all_geoms = polygons_df(pages.sparkSession, polys).select("geom_id")
    out = all_geoms.join(F.broadcast(agg), "geom_id", "left").withColumn(
        "n_pages", F.coalesce(F.col("n_pages"), F.lit(0))
    )
    if emptyval is not None:
        for c in ("sum_val", "mean_val", "min_val", "max_val"):
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(emptyval)))
    return out


def merge_zonal_partials(parts: DataFrame) -> DataFrame:
    """Re-aggregate per-batch zonal partials (the ledger-mode job appends
    one row per geom per tile batch) into the final one-row-per-geom table.

    count/sum/min/max merge exactly; the mean is recomputed as
    sum_val / n_pages (never averaged across partials — that would weight
    batches, not pages). Geoms whose every partial was empty keep
    n_pages=0 / NULL stats, matching ``zonal_pages`` semantics."""
    merged = parts.groupBy("geom_id").agg(
        F.sum("n_pages").alias("n_pages"),
        F.sum("sum_val").alias("sum_val"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )
    return merged.select(
        "geom_id",
        "n_pages",
        "sum_val",
        F.when(
            F.col("n_pages") > 0, F.col("sum_val") / F.col("n_pages")
        ).alias("mean_val"),
        "min_val",
        "max_val",
    )


def raster_geom_candidates(
    raster: DataFrame,
    grid: GridSpec,
    polys: list[Polygon],
    boundary: str = "center",
    block: int = GEOM_BLOCK,
    keep_arrays: bool = False,
) -> DataFrame:
    """ONE-SCAN (cell, geometry) candidates over a finite raster grid.

    Returns the raster columns plus ``geom_id``, the polygon bbox columns,
    and ``_inside`` (the boundary predicate). Plan: cells compute their
    coarse block, equi-join the broadcast block cover (candidate
    reduction), join the broadcast polygon edge table, and evaluate the
    boundary predicate on the joined edge/vert ARRAYS — expression size is
    O(1) in the polygon count, and N polygons cost one raster scan instead
    of N filtered subtrees. Each cell lives in exactly one block, so no
    candidate is produced twice.
    """
    spark = raster.sparkSession
    pad = 1 if boundary == "touches" else 0
    cover = polygon_block_cover_df(spark, polys, grid, block, pad_cells=pad)
    pdf = polygons_df(spark, polys)
    r = raster.withColumn("_bx", F.floor(F.col("ix") / block).cast("int")).withColumn(
        "_by", F.floor(F.col("iy") / block).cast("int")
    )
    cand = r.join(F.broadcast(cover), ["_bx", "_by"]).join(F.broadcast(pdf), "geom_id")
    cx = grid.x_col(F.col("ix"))
    cy = grid.y_col(F.col("iy"))
    # |step|: cell half-widths and bbox pads are magnitudes — signed steps
    # (north-up dy<0) must not flip the predicate direction
    adx, ady = abs(grid.dx), abs(grid.dy)
    bpx = adx if boundary == "touches" else 0.0
    bpy = ady if boundary == "touches" else 0.0
    in_bbox = (
        (cx >= F.col("xmin") - bpx)
        & (cx <= F.col("xmax") + bpx)
        & (cy >= F.col("ymin") - bpy)
        & (cy <= F.col("ymax") + bpy)
    )
    poly_row = {"edges": F.col("edges"), "verts": F.col("verts")}
    inside = in_bbox & boundary_pred(boundary, cx, cy, adx / 2.0, ady / 2.0, poly_row)
    out = cand.withColumn("_inside", inside).drop("_bx", "_by")
    return out if keep_arrays else out.drop("edges", "verts")


def zonal_raster(
    raster: DataFrame,
    grid: GridSpec,
    polys: list[Polygon],
    boundary: str = "center",
    skipmissing: bool = True,
) -> DataFrame:
    """Zonal over a raster: per-polygon reduce of masked cells — the exact
    `zonal == f∘skipmissing∘mask` identity the reference tests
    (`test/methods.jl:332-338`).

    ``skipmissing=False`` reproduces the reference's crop→mask→f semantics
    (`src/methods/zonal.jl:100-107,155-165`): f runs over the polygon's
    *crop box*, where cells outside the polygon have just been masked to
    missing — so the result is missing unless the polygon exactly tiles its
    box AND no data cell is missing (`test/methods.jl:358-365` golden).

    Plan: ONE raster scan through the broadcast block-cover join
    (:func:`raster_geom_candidates`) + one groupBy(geom_id) — N polygons no
    longer mean N scans (the reference's own scale smoke is 10,000 regions,
    `test/mosaic.jl:69-74`).
    """
    cand = raster_geom_candidates(raster, grid, polys, boundary)
    cx = grid.x_col(F.col("ix"))
    cy = grid.y_col(F.col("iy"))
    in_box = (
        (cx >= F.col("xmin"))
        & (cx <= F.col("xmax"))
        & (cy >= F.col("ymin"))
        & (cy <= F.col("ymax"))
    )
    u = cand.where(in_box).select(
        "geom_id", F.when(F.col("_inside"), F.col("value")).alias("_mval")
    )
    agg = u.groupBy("geom_id").agg(
        F.sum("_mval").alias("sum_val"),
        F.avg("_mval").alias("mean_val"),
        F.count("_mval").alias("n_cells"),
        F.max(F.col("_mval").isNull().cast("int")).alias("_has_null"),
    )
    if not skipmissing:
        agg = agg.select(
            "geom_id",
            F.when(F.col("_has_null") == 1, F.lit(None)).otherwise(F.col("sum_val")).alias("sum_val"),
            F.when(F.col("_has_null") == 1, F.lit(None)).otherwise(F.col("mean_val")).alias("mean_val"),
            "n_cells",
        )
    else:
        agg = agg.drop("_has_null")
    return agg


def zonal_extent(
    raster: DataFrame, grid: GridSpec, xmin: float, xmax: float, ymin: float, ymax: float
) -> DataFrame:
    """Zonal over a bare extent: crop-only then reduce
    (`src/methods/zonal.jl:84-92`)."""
    from rasters_jl_spark.operators.core import crop

    c = crop(raster, grid, xmin, xmax, ymin, ymax)
    return c.agg(
        F.sum("value").alias("sum_val"),
        F.avg("value").alias("mean_val"),
        F.count("value").alias("n_cells"),
    )


def zonal_stack(stack: DataFrame, grid, polys, boundary: str = "center") -> DataFrame:
    """Per-(geometry, layer) zonal stats over a stacked raster
    (`src/methods/zonal.jl:67-165` RasterStack form: one NamedTuple entry
    per layer → here one row per (geom_id, layer)).

    ``stack``: (ix, iy, layer, value). ONE scan: cells join the broadcast
    block cover + edge tables (:func:`raster_geom_candidates`) — expression
    size and scan count are O(1) in the polygon count — then a single
    groupBy(geom_id, layer) with map-side partial aggregation.
    Empty (geom, layer) zones come back n_cells=0 / NULL stats.
    """
    hits = (
        raster_geom_candidates(stack, grid, polys, boundary)
        .where(F.col("_inside"))
        .groupBy("geom_id", "layer")
        .agg(
            F.count("value").alias("n_cells"),
            F.sum("value").alias("sum_val"),
            F.avg("value").alias("mean_val"),
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
        )
    )
    spark = stack.sparkSession
    geoms = spark.createDataFrame([(p.geom_id,) for p in polys], "geom_id int")
    layers = stack.select("layer").distinct()
    universe = geoms.crossJoin(layers)
    return universe.join(F.broadcast(hits), ["geom_id", "layer"], "left").withColumn(
        "n_cells", F.coalesce(F.col("n_cells"), F.lit(0))
    )


def zonal_coverage(
    raster: DataFrame,
    grid,
    polys: list[Polygon],
    frac_units: int = 1_000_000_000,
    prod_units: int = 1_000_000,
) -> DataFrame:
    """COVERAGE-WEIGHTED zonal statistics (exactextract-style): each cell
    contributes its value weighted by the EXACT fraction of the cell the
    polygon covers — the analytic bridge between the reference's `coverage`
    (`src/methods/coverage.jl:46-117`) and `zonal` (`src/methods/zonal.jl:
    67-165`), which a Rasters.jl user composes as
    ``zonal(sum, raster .* coverage(geom))``.

    Per (cell, geom) candidate the clipped fraction is the closed-form
    per-edge clamped Green's-theorem integral fold over the JOINED edge
    array (`functions/geometry.py::clip_area_edge_col`) — pure codegen, no
    subpixel explode. Plan: one scan → broadcast block-cover join →
    fraction expression → groupBy(geom_id) with map-side partial agg.

    Shuffle-payload determinism: the per-cell fraction and value×fraction
    are quantized to INTEGER units (``frac_units``/``prod_units``) BEFORE
    the aggregation, so the shuffled sums are order-independent BIGINTs —
    float summation order can never perturb the result (same discipline as
    the ppl-bucket scores). ``cov_cells`` = Σ fraction is the polygon area
    in cell units — an analytic invariant tested against the shoelace
    area. Weights are planar cell fractions; for spherical-area weighting
    multiply by `cellarea` per row before aggregating.
    """
    from rasters_jl_spark.functions.geometry import clip_area_edge_col

    cand = raster_geom_candidates(
        raster, grid, polys, boundary="touches", keep_arrays=True
    ).where(F.col("_inside"))
    hdx, hdy = abs(grid.dx) / 2.0, abs(grid.dy) / 2.0
    cx = grid.x_col(F.col("ix"))
    cy = grid.y_col(F.col("iy"))
    x0, x1 = cx - F.lit(hdx), cx + F.lit(hdx)
    y0, y1 = cy - F.lit(hdy), cy + F.lit(hdy)
    signed = F.aggregate(
        F.col("edges"),
        F.lit(0.0),
        lambda acc, e: acc
        + clip_area_edge_col((e["x1"], e["y1"], e["x2"], e["y2"]), x0, x1, y0, y1),
    )
    frac = F.abs(signed) / F.lit(abs(grid.dx) * abs(grid.dy))
    q = cand.select(
        "geom_id",
        F.round(frac * F.lit(float(frac_units))).cast("long").alias("_fi"),
        F.round(F.col("value") * frac * F.lit(float(prod_units))).cast("long").alias("_pi"),
    )
    agg = q.groupBy("geom_id").agg(
        F.sum("_fi").alias("_sfi"), F.sum("_pi").alias("_spi")
    )
    fu, pu = float(frac_units), float(prod_units)
    return (
        agg.where(F.col("_sfi") > 0)
        .select(
            "geom_id",
            F.round(F.col("_sfi") / F.lit(fu), 6).alias("cov_cells"),
            F.round(F.col("_spi") / F.lit(pu), 6).alias("w_sum"),
            F.round(
                (F.col("_spi") / F.lit(pu)) / (F.col("_sfi") / F.lit(fu)), 6
            ).alias("w_mean"),
        )
    )
