"""Shared query fixtures: polygon sets, target grids, constants.

Single source of truth consumed by BOTH the Spark queries and the DuckDB
oracle SQL generators (`rasters_jl_spark/queries.py`), so the two sides can
never drift. Geometry mirrors the reference test fixtures (FIXTURES.md):
the −20..0 × 10..30 square is `test/methods.jl:16-20`'s canonical polygon.
"""

from __future__ import annotations

from rasters_jl_spark.functions.geometry import Polygon
from rasters_jl_spark.grid import GridSpec

# ---- lat/lon polygons for page joins (x=lon, y=lat) ----
POLYS_GEO = [
    Polygon(1, ((-20.0, 30.0), (-20.0, 10.0), (0.0, 10.0), (0.0, 30.0))),
    # non-convex pentagon (notch at (20,10)) — exercises general even-odd PIP
    Polygon(2, ((10.0, 0.0), (30.0, 0.0), (30.0, 20.0), (20.0, 10.0), (10.0, 20.0))),
    Polygon(3, ((60.0, -40.0), (120.0, -40.0), (120.0, 40.0), (60.0, 40.0))),
    Polygon(4, ((150.0, 60.0), (175.0, 60.0), (175.0, 85.0), (150.0, 85.0))),
]

# ---- polygons over the synthetic 20×20 raster grid (centers 0..19) ----
RASTER_POLYS = [
    # rectangle with edges on half-integers → unambiguous center ownership
    Polygon(1, ((2.5, 4.5), (10.5, 4.5), (10.5, 12.5), (2.5, 12.5))),
    # irregular non-convex pentagon
    Polygon(2, ((1.2, 1.1), (8.7, 2.3), (7.4, 9.9), (4.2, 6.1), (0.8, 8.5))),
]

# coverage rectangles (geom_id, xmin, xmax, ymin, ymax) — fractional edges
COVERAGE_RECTS = [
    (1, 2.25, 10.75, 4.25, 12.75),
    (2, 8.5, 15.1, 10.2, 17.9),
]

# ---- many-polygon scale fixture (reference scale smoke: 10k regions,
# test/mosaic.jl:69-74): n_side² diamonds on a 128×128 grid. Diamond edge
# constants have .2/.8 fractional parts while cell-center coordinate sums
# are integral, so no center ever lies ON an edge (PIP == closed form). ----
def many_polys(n_side: int = 32, cell: float = 4.0, r: float = 2.2) -> list[Polygon]:
    polys = []
    gid = 1
    for j in range(n_side):
        for i in range(n_side):
            cx, cy = (i + 0.5) * cell, (j + 0.5) * cell
            polys.append(
                Polygon(gid, ((cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r)))
            )
            gid += 1
    return polys


MANY_GRID = GridSpec(x0=0.5, y0=0.5, dx=1.0, dy=1.0, nx=128, ny=128)

# ---- resample target grids ----
RESAMPLE_TGT = GridSpec(x0=0.3, y0=0.9, dx=1.7, dy=2.1, nx=11, ny=9)
RESAMPLE_COARSE = GridSpec(x0=1.0, y0=1.0, dx=2.5, dy=2.5, nx=8, ny=8)

# 5-degree global grid for cellarea
CELLAREA_GRID = GridSpec(x0=-177.5, y0=-87.5, dx=5.0, dy=5.0, nx=72, ny=36)

# rasterize-points grid: 10° lat/lon boxes
POINTS_GRID = GridSpec(x0=-175.0, y0=-85.0, dx=10.0, dy=10.0, nx=36, ny=18)

# ---- extract points: deterministic pseudo-random points on the 20×20 grid ----
N_EXTRACT_PTS = 100
PX_SQL = "(((pt_id * 7919) % 200) / 10.0)"  # ∈ [0, 20)
PY_SQL = "(((pt_id * 104729) % 200) / 10.0)"

# ---- kNN queries: F1 hash formula on ids 1_000_000.. (FIXTURES.md F9) ----
N_KNN_QUERIES = 20
KNN_K = 5
KNN_ID_BASE = 1_000_000

# ---- dedup corpus augmentation (guaranteed dups, both engines agree) ----
DUP_EVERY = 50  # doc_id % DUP_EVERY == 0 gets an exact copy at +100000
NEARDUP_SUFFIX = " qq zz"
DUP_OFFSET = 100_000
# planted <3-token doc (ids -1/-2): exercises the whole-text shingle fallback
SHORT_DOC_TEXT = "zz yy"

# ---- misc ----
CLASSIFY_BINS = [(0.0, 2000.0, 1), (2000.0, 4000.0, 2), (4000.0, 1e18, 3)]
AGG_SCALE = 4
DISAGG_SCALE = 2
CROP_BOX = (3.0, 15.0, 2.0, 18.0)  # xmin, xmax, ymin, ymax on the 20×20 grid
EXTEND_BOX = (-2, 23, -2, 23)  # ix_min, ix_max, iy_min, iy_max
TRIM_KEEP = (5, 12, 4, 14)  # ix0, ix1, iy0, iy1 band kept before trimming
ASOF_T = "2024-01-02 00:00:00"
SAMPLE_N = 50
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 5
