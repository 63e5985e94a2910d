"""Relational core: crop / extend / trim / mask / classify / replace_missing.

Each operator is a pure DataFrame transform over the long raster format
``(ix, iy, value)`` + :class:`GridSpec`. They compile to filters, CASE
expressions and joins that Catalyst can push down and prune — the Spark
analogues of the reference's lazy views (`src/methods/crop_extend.jl`,
`src/methods/trim.jl`, `src/methods/mask.jl`, `src/methods/classify.jl`,
`src/methods/replace_missing.jl`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rasters_jl_spark.functions.geometry import Polygon, boundary_pred, polygons_df
from rasters_jl_spark.grid import GridSpec


def crop(raster: DataFrame, grid: GridSpec, xmin: float, xmax: float, ymin: float, ymax: float) -> DataFrame:
    """Cut to extent — a pure filter on cell-center coordinates; at scale the
    predicate prunes parquet row groups/partitions for free.

    Reference: `crop`/`_crop_to` (`src/methods/crop_extend.jl:71-117`)
    returns a lazy view; cells whose *center* lies in the closed extent are
    kept (Touches/`atol` variants are extent padding at the call site).
    """
    x = grid.x_col(F.col("ix"))
    y = grid.y_col(F.col("iy"))
    return raster.where((x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax))


def crop_to_geoms(raster: DataFrame, grid: GridSpec, polys) -> DataFrame:
    """``crop(x; to=polygon)`` — crop to the combined bbox of a geometry
    set (`src/methods/crop_extend.jl:71-117` `to=` geometry branch;
    golden `test/methods.jl:481-494`). Pure wrapper: extent = union of
    polygon bboxes, then the pushdown-friendly coordinate filter."""
    xmin = min(p.bbox[0] for p in polys)
    xmax = max(p.bbox[1] for p in polys)
    ymin = min(p.bbox[2] for p in polys)
    ymax = max(p.bbox[3] for p in polys)
    return crop(raster, grid, xmin, xmax, ymin, ymax)


def extend(raster: DataFrame, grid: GridSpec, ix_min: int, ix_max: int, iy_min: int, iy_max: int) -> DataFrame:
    """Grow to a larger index box, filling new cells with NULL.

    Reference: `extend` (`src/methods/crop_extend.jl:158-269`) fills with
    ``missingval``. Spark: generate the target cell universe with
    ``spark.range`` cross-join (no data shuffle — both ranges are tiny and
    broadcast) and left-join the existing values.
    """
    spark = raster.sparkSession
    xs = spark.range(ix_min, ix_max + 1).select(F.col("id").cast("int").alias("ix"))
    ys = spark.range(iy_min, iy_max + 1).select(F.col("id").cast("int").alias("iy"))
    universe = xs.crossJoin(ys)
    return universe.join(raster, ["ix", "iy"], "left")


def trim(raster: DataFrame, pad: int = 0) -> DataFrame:
    """Shrink to the bounding box of non-missing cells (+pad).

    Reference: `src/methods/trim.jl:54-134` tracks per-axis non-missing
    extents. Spark: one aggregate pass for the 4 scalars, broadcast back as
    a cross join (never collected to the driver), then filter. Two scans of
    the (cached) input — same asymptotics as the reference's two passes.
    """
    bounds = raster.where(F.col("value").isNotNull()).agg(
        F.min("ix").alias("_ix0"),
        F.max("ix").alias("_ix1"),
        F.min("iy").alias("_iy0"),
        F.max("iy").alias("_iy1"),
    )
    out = raster.crossJoin(F.broadcast(bounds)).where(
        (F.col("ix") >= F.col("_ix0") - pad)
        & (F.col("ix") <= F.col("_ix1") + pad)
        & (F.col("iy") >= F.col("_iy0") - pad)
        & (F.col("iy") <= F.col("_iy1") + pad)
    )
    return out.drop("_ix0", "_ix1", "_iy0", "_iy1")


def mask_raster(raster: DataFrame, with_raster: DataFrame, invert: bool = False) -> DataFrame:
    """Mask by another raster: value → NULL where ``with`` is missing
    (invert: where ``with`` is present).

    Reference: `_mask!` (`src/methods/mask.jl:183-211`); invert keyword
    (`src/methods/mask.jl:2-5,191-199`). Spark: left join on the integer
    cell index + CASE. No broadcast hint: a mask raster is typically the
    SAME cardinality as the data raster, so forcing a broadcast is an OOM
    at scale — AQE picks broadcast on its own when the mask side is
    genuinely small, and tile-bucketed layouts co-locate the join.
    """
    m = with_raster.select("ix", "iy", F.col("value").alias("_mval"))
    joined = raster.join(m, ["ix", "iy"], "left")
    if invert:
        keep = F.col("_mval").isNull()
    else:
        keep = F.col("_mval").isNotNull()
    return joined.select(
        "ix", "iy", F.when(keep, F.col("value")).otherwise(F.lit(None)).alias("value")
    )


def mask_geom(
    raster: DataFrame,
    grid: GridSpec,
    polys: list[Polygon],
    boundary: str = "center",
    invert: bool = False,
) -> DataFrame:
    """Mask by geometry: NULL outside the polygons (invert: NULL inside).

    Reference: `_mask`/`boolmask` (`src/methods/mask.jl:76-103,297-319`)
    with boundary ∈ {center, touches, inside}. Spark: broadcast the polygon
    edge arrays, evaluate the boundary predicate as a codegen'd higher-order
    expression per cell — a broadcast semi-join, no shuffle. Past
    ``BOOLMASK_LITERAL_MAX`` polygons the covered-cells join takes over.
    """
    if len(polys) > BOOLMASK_LITERAL_MAX:
        j = _covered_flag(raster, grid, polys, boundary)
        keep = ~F.col("_cov") if invert else F.col("_cov")
        return j.select(
            "ix", "iy", F.when(keep, F.col("value")).otherwise(F.lit(None)).alias("value")
        )
    inside = boolmask_col(raster, grid, polys, boundary)
    keep = ~inside if invert else inside
    return raster.select(
        "ix", "iy", F.when(keep, F.col("value")).otherwise(F.lit(None)).alias("value")
    )


# past this many polygons the literal OR-chain predicate (boolmask_col)
# would blow Catalyst codegen/constant-folding limits; the covered-cells
# broadcast cover JOIN takes over (same semantics, O(1) expression size)
BOOLMASK_LITERAL_MAX = 64


def covered_cells(raster: DataFrame, grid: GridSpec, polys: list[Polygon], boundary: str) -> DataFrame:
    """Distinct (ix, iy) cells covered by ANY polygon — the join path for
    large polygon sets: one scan through the broadcast block-cover + edge
    join (`operators/zonal.py::raster_geom_candidates`), then a distinct."""
    from rasters_jl_spark.operators.zonal import raster_geom_candidates

    cand = raster_geom_candidates(raster.select("ix", "iy"), grid, polys, boundary)
    return cand.where(F.col("_inside")).select("ix", "iy").dropDuplicates(["ix", "iy"])


def _covered_flag(raster: DataFrame, grid: GridSpec, polys: list[Polygon], boundary: str) -> DataFrame:
    """raster columns + boolean ``_cov`` via the covered-cells left join."""
    cov = covered_cells(raster, grid, polys, boundary).withColumn("_hit", F.lit(True))
    return raster.join(cov, ["ix", "iy"], "left").withColumn(
        "_cov", F.coalesce(F.col("_hit"), F.lit(False))
    ).drop("_hit")


def boolmask_col(raster: DataFrame, grid: GridSpec, polys: list[Polygon], boundary: str) -> Column:
    """Column: cell is covered by ANY of the polygons under ``boundary``.

    Literal-predicate form — zero joins, zero shuffles, but O(n_polys ×
    edges) expression size; callers switch to :func:`covered_cells` past
    ``BOOLMASK_LITERAL_MAX`` polygons."""
    spark = raster.sparkSession
    pdf = polygons_df(spark, polys)
    rows = pdf.collect()  # geometry side: tiny, broadcast into the plan as literals
    cx = grid.x_col(F.col("ix"))
    cy = grid.y_col(F.col("iy"))
    pred = F.lit(False)
    for r in rows:
        poly_row = {
            "edges": F.array(
                *[
                    F.struct(
                        F.lit(e["x1"]).alias("x1"),
                        F.lit(e["y1"]).alias("y1"),
                        F.lit(e["x2"]).alias("x2"),
                        F.lit(e["y2"]).alias("y2"),
                    )
                    for e in r["edges"]
                ]
            ),
            "verts": F.array(
                *[
                    F.struct(F.lit(v["x"]).alias("x"), F.lit(v["y"]).alias("y"))
                    for v in r["verts"]
                ]
            ),
        }
        # magnitudes: signed steps (north-up dy<0) must not flip pads/widths
        bbox_pad_x = abs(grid.dx) if boundary == "touches" else 0.0
        bbox_pad_y = abs(grid.dy) if boundary == "touches" else 0.0
        in_bbox = (
            (cx >= r["xmin"] - bbox_pad_x)
            & (cx <= r["xmax"] + bbox_pad_x)
            & (cy >= r["ymin"] - bbox_pad_y)
            & (cy <= r["ymax"] + bbox_pad_y)
        )
        pred = pred | (
            in_bbox
            & boundary_pred(boundary, cx, cy, abs(grid.dx) / 2.0, abs(grid.dy) / 2.0, poly_row)
        )
    return pred


def boolmask(raster: DataFrame, grid: GridSpec, polys: list[Polygon], boundary: str = "center", invert: bool = False) -> DataFrame:
    """(ix, iy, mask:boolean) — reference `boolmask` (`src/methods/mask.jl:265-361`)."""
    if len(polys) > BOOLMASK_LITERAL_MAX:
        c = F.col("_cov")
        if invert:
            c = ~c
        return _covered_flag(raster, grid, polys, boundary).select("ix", "iy", c.alias("mask"))
    c = boolmask_col(raster, grid, polys, boundary)
    if invert:
        c = ~c
    return raster.select("ix", "iy", c.alias("mask"))


def replace_missing(raster: DataFrame, sentinel: float, to_null: bool = True) -> DataFrame:
    """Sentinel ⇄ NULL conversion.

    Reference: `replace_missing` rewrites data *and* the missingval field
    (`src/methods/replace_missing.jl:24-66`). The engine's convention is
    NULL end-to-end, so ``to_null=True`` is the ingest normalisation and
    ``to_null=False`` re-materialises a sentinel for sinks that need one.
    """
    v = F.col("value")
    if to_null:
        out = F.when(v == F.lit(sentinel), F.lit(None)).otherwise(v)
    else:
        out = F.coalesce(v, F.lit(float(sentinel)))
    return raster.select("ix", "iy", out.alias("value"))


def classify(
    raster: DataFrame,
    bins: list[tuple[float, float, float]],
    others=None,
    lower: str = "closed",
    upper: str = "open",
) -> DataFrame:
    """Map value ranges to classes: ``bins = [(lo, hi, class), ...]`` —
    the reference's matrix form — first matching bin wins.

    ``lower``/``upper`` choose each bound's comparator (the reference's
    `lower=(>=)` / `upper=(<)` keyword pair, `src/methods/classify.jl:
    130-217`): "closed" = inclusive, "open" = exclusive. Default
    lower-closed / upper-open. Missing stays missing; ``others`` fills
    unmatched values. Spark: a CASE WHEN chain (pure codegen).
    """
    v = F.col("value")

    def lo_cmp(lo):
        return v >= F.lit(lo) if lower == "closed" else v > F.lit(lo)

    def hi_cmp(hi):
        return v <= F.lit(hi) if upper == "closed" else v < F.lit(hi)

    expr = None
    for lo, hi, cls in bins:
        cond = lo_cmp(lo) & hi_cmp(hi)
        expr = F.when(cond, F.lit(cls)) if expr is None else expr.when(cond, F.lit(cls))
    tail = F.lit(others) if others is not None else F.lit(None)
    out = F.when(v.isNull(), F.lit(None)).otherwise(expr.otherwise(tail))
    return raster.select("ix", "iy", out.alias("value"))


def points(raster: DataFrame, grid: GridSpec, skipmissing: bool = True) -> DataFrame:
    """Raster → (x, y[, value]) coordinate rows.

    Reference: `src/methods/points.jl:20-34`.
    """
    out = raster.select(
        grid.x_col(F.col("ix")).alias("x"), grid.y_col(F.col("iy")).alias("y"), "value"
    )
    return out.where(F.col("value").isNotNull()) if skipmissing else out
