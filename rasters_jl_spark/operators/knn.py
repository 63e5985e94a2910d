"""kNN via cell-ring expansion (north-rule operator; no reference analogue —
the reference's closest machinery is the `Near` selector, `src/lookup.jl`).

Exact k-nearest pages per query point, planar squared-degree distance
(engine-defined semantics so the brute-force oracle agrees bit-for-bit):

phase 1: candidates from rings ≤ R0 around each query cell, R0 sized from
         global page density (one scalar aggregate, not a collect loop);
phase 2: kth candidate distance per query (window) → per-query final radius
         R_q = ceil(sqrt(d_k)/step)+1 → re-join rings ≤ R_q → exact top-k;
brute tier: queries phase 2 cannot satisfy within RING_MAX cells (<k
         candidates in R0, or R_q would exceed RING_MAX) fall back to ONE
         broadcast-nested-loop pass over pages — rare by construction
         (density-sized R0), bounded memory (no grid-sized ring arrays),
         still exact. AQE's empty-relation propagation elides the brute
         scan when no query needs it.

Phase 2 guarantees exactness: any page closer than the phase-1 kth distance
lies within R_q rings of the query cell. All fan-out is `explode` of
generated ring arrays capped at (2·RING_MAX+1)² elements — no driver
iteration, scales with #queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rasters_jl_spark.grid import WebGrid

# largest ring radius (in cells) the explode path will materialize:
# (2·64+1)² = 16,641 array elements per query row — past this, exactness
# comes from the brute tier instead of a grid-sized ring array
RING_MAX = 64


def _ring_candidates(queries: DataFrame, pages: DataFrame, g: WebGrid, radius_col) -> DataFrame:
    q = queries.withColumn("_qcell", g.cell_col(F.col("qlon"), F.col("qlat")))
    q = q.withColumn("_cells", g.ring_cells_col(F.col("_qcell"), radius_col))
    q = q.select("q_id", "qlat", "qlon", F.explode("_cells").alias("cell"))
    p = pages.select(
        "cell", F.col("doc_id").alias("doc_id"), F.col("lat").alias("_plat"), F.col("lon").alias("_plon")
    )
    cand = q.join(p, "cell")
    d2 = (F.col("_plat") - F.col("qlat")) * (F.col("_plat") - F.col("qlat")) + (
        F.col("_plon") - F.col("qlon")
    ) * (F.col("_plon") - F.col("qlon"))
    return cand.withColumn("dist2", d2)


def knn_pages(
    queries: DataFrame,
    pages: DataFrame,
    k: int = 5,
    res: int | None = None,
    n_pages: int | None = None,
) -> DataFrame:
    """For each (q_id, qlat, qlon) query row: the k nearest pages.

    ``pages`` must carry (doc_id, lat, lon, cell) at resolution ``res``
    (defaults to the resolution implied by the cell column — pass it).
    ``n_pages`` sizes the phase-1 ring radius from density; pass the
    catalog row count when known (at 10¹² scale that's table statistics,
    not an online count) — left None, one count() action runs here.
    Returns (q_id, rank, doc_id, dist2).
    """
    from rasters_jl_spark.grid import PAGES_RES

    g = WebGrid(res if res is not None else PAGES_RES)
    if n_pages is None:
        n_pages = pages.count()  # one scalar action to size R0 from density
    density = max(n_pages, 1) / float(g.nx * g.ny)
    import math

    r0 = max(1, int(math.ceil(math.sqrt((k + 4) / max(density, 1e-12)) / 2.0)))
    r0 = min(r0, max(g.nx, g.ny), RING_MAX)

    w = Window.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("doc_id").asc())

    cand1 = _ring_candidates(queries, pages, g, F.lit(r0))
    kth = (
        cand1.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == k)
        .select("q_id", F.col("dist2").alias("_dk"))
    )
    # per-query exact radius; NULL when phase 1 found <k candidates
    rf_need = (F.ceil(F.sqrt(F.col("_dk")) / F.lit(g.step)) + 1).cast("int")
    q2 = queries.join(kth, "q_id", "left").withColumn("_rf", rf_need)
    ring_q = q2.where(F.col("_rf").isNotNull() & (F.col("_rf") <= RING_MAX))
    brute_q = q2.where(F.col("_rf").isNull() | (F.col("_rf") > RING_MAX))

    cand2 = _ring_candidates(
        ring_q.select("q_id", "qlat", "qlon", "_rf"), pages, g, F.col("_rf")
    )
    out_ring = (
        cand2.dropDuplicates(["q_id", "doc_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "doc_id", "dist2")
    )
    # brute tier: one pages pass against the (rare, tiny) unsatisfied
    # queries — broadcast-nested-loop, no ring arrays at any resolution
    bq = F.broadcast(brute_q.select("q_id", "qlat", "qlon"))
    p = pages.select("doc_id", F.col("lat").alias("_plat"), F.col("lon").alias("_plon"))
    d2 = (F.col("_plat") - F.col("qlat")) * (F.col("_plat") - F.col("qlat")) + (
        F.col("_plon") - F.col("qlon")
    ) * (F.col("_plon") - F.col("qlon"))
    out_brute = (
        bq.crossJoin(p)
        .withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "doc_id", "dist2")
    )
    return out_ring.unionByName(out_brute)
