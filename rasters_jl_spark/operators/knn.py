"""kNN via cell-ring expansion (north-rule operator; no reference analogue —
the reference's closest machinery is the `Near` selector, `src/lookup.jl`).

Exact k-nearest pages per query point, planar squared-degree distance
(engine-defined semantics so the brute-force oracle agrees bit-for-bit):

phase 1: candidates from rings ≤ R0 around each query cell, R0 sized from
         global page density (one scalar aggregate, not a collect loop);
         the same window pass yields rank AND the kth distance, and when
         the implied exact radius R_q = ceil(sqrt(d_k)/step)+1 fits in R0
         the top-k is emitted DIRECTLY from phase-1 candidates — the
         common case costs one pages scan and one q_id exchange;
phase 2: only queries whose radius GREW past R0 re-join rings ≤ R_q;
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

# largest exploded queries×ring-cells row count the broadcast hint is
# allowed to cover (~40 B/row → a few hundred MB relation): past this a
# forced broadcast risks exceeding Spark's broadcast relation limit and
# OOMing the driver, so the join falls back to a shuffle — correct either
# way, the hint is purely a physical-plan choice
BROADCAST_ROWS_MAX = 4_000_000


def _ring_candidates(
    queries: DataFrame,
    pages: DataFrame,
    g: WebGrid,
    radius_col,
    exploded_rows_est: int | None = None,
) -> DataFrame:
    q = queries.withColumn("_qcell", g.cell_col(F.col("qlon"), F.col("qlat")))
    q = q.withColumn("_cells", g.ring_cells_col(F.col("_qcell"), radius_col))
    q = q.select("q_id", "qlat", "qlon", F.explode("_cells").alias("cell"))
    p = pages.select(
        "cell", F.col("doc_id").alias("doc_id"), F.col("lat").alias("_plat"), F.col("lon").alias("_plon")
    )
    # The query side arrives behind shuffles, so without a hint Spark can't
    # see when it's small and plans a sort-merge join that shuffles the
    # whole pages table. But the hint is only safe when the exploded side
    # actually fits in a broadcast relation: the caller passes its row
    # estimate (n_queries × ring cells) and past BROADCAST_ROWS_MAX the
    # hint is withheld (many-query phase-1 at r0=RING_MAX would otherwise
    # force a multi-GB broadcast and fail where the shuffle join works).
    if exploded_rows_est is None or exploded_rows_est <= BROADCAST_ROWS_MAX:
        q = F.broadcast(q)
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
    n_queries: int | None = None,
) -> DataFrame:
    """For each (q_id, qlat, qlon) query row: the k nearest pages.

    ``pages`` must carry (doc_id, lat, lon, cell) at resolution ``res``
    (defaults to the resolution implied by the cell column — pass it).
    ``n_pages`` sizes the phase-1 ring radius from density; ``n_queries``
    gates the phase-1 broadcast hint (exploded queries×ring-cells rows
    must fit in a broadcast relation). Pass the catalog row counts when
    known (at 10¹² scale that's table statistics, not an online count) —
    left None, one count() action each runs here.
    Returns (q_id, rank, doc_id, dist2).
    """
    from rasters_jl_spark.grid import PAGES_RES

    g = WebGrid(res if res is not None else PAGES_RES)
    if n_pages is None:
        n_pages = pages.count()  # one scalar action to size R0 from density
    if n_queries is None:
        n_queries = queries.count()  # sizes the phase-1 broadcast gate
    density = max(n_pages, 1) / float(g.nx * g.ny)
    import math

    # Expected kth-neighbour radius in CELL units at this density, sized
    # with the SAME +1 cell-position margin as the phase-2 exactness
    # radius (rf = ceil(dist/step) + 1): r0 must be able to SATISFY the
    # done-test rf <= r0, and rf is never below 2, so a floor of 2 keeps
    # the common case inside phase 1 (r3's /2-sized r0=1 sent 100% of
    # uniform-density queries to a second pages pass).
    r0 = int(math.ceil(math.sqrt((k + 4) / max(density, 1e-12)))) + 1
    r0 = min(max(r0, 2), max(g.nx, g.ny), RING_MAX)

    w = Window.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("doc_id").asc())

    # Phase 1 doubles as the ANSWER for queries whose exact radius fits in
    # r0: rank + per-query kth distance come from ONE window pass, and when
    # _rf <= r0 every page that could beat the kth candidate already sits
    # in the phase-1 ring set — output directly, no second pages scan.
    # Only queries whose radius GREW past r0 (or found <k candidates) go
    # to phase 2 / brute.
    #
    # The rank filter comes FIRST (its own projection step) so Spark's
    # InferWindowGroupLimit rewrites it into a partial top-k that runs
    # map-side BEFORE the q_id exchange: the shuffle carries k rows per
    # (query, map partition) instead of every ring candidate — at corpus
    # scale the exchange payload drops from density×(2r0+1)² rows per
    # query to k per partition. _dk (the kth distance) is then a window
    # max over the ≤k surviving rows — same value as computing it over
    # the full candidate set, since the rank-k row survives the filter.
    cand1 = _ring_candidates(
        queries, pages, g, F.lit(r0), exploded_rows_est=n_queries * (2 * r0 + 1) ** 2
    )
    rf_need = (F.ceil(F.sqrt(F.col("_dk")) / F.lit(g.step)) + 1).cast("int")
    topk = cand1.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    c = topk.withColumn(
        "_dk",
        F.max(F.when(F.col("_rn") == k, F.col("dist2"))).over(
            Window.partitionBy("q_id")
        ),
    ).withColumn("_rf", rf_need)
    # Materialise the per-query top-k ONCE (lazy: runs on first action).
    # All four consumers below (direct output, per-query radii, ring and
    # brute routing) otherwise re-derive this subtree, and AQE's stage
    # dedup only reused one of the three identical exchanges — the corpus
    # candidate join ran per branch. The table is k×n_queries rows
    # (bounded query metadata, the pagerank-checkpoint class), so the
    # checkpoint is metadata-sized at any corpus scale and the pages scan
    # runs exactly once in the common all-done-in-phase-1 case.
    c = c.localCheckpoint(eager=False)
    out_done = c.where(F.col("_rf").isNotNull() & (F.col("_rf") <= r0)).select(
        "q_id", F.col("_rn").alias("rank"), "doc_id", "dist2"
    )

    # per-query radius; NULL when phase 1 found <k candidates (queries
    # with ZERO candidates don't appear in cand1 — the left join below
    # routes them to brute). qinfo is ≤1 row per query, so whenever the
    # query side itself is small enough to broadcast (the same gate the
    # phase-1 ring join uses), broadcast qinfo too: the left join then
    # needs no exchange/sort on the queries side.
    qinfo = c.groupBy("q_id").agg(F.min("_rf").alias("_rf"))
    if n_queries <= BROADCAST_ROWS_MAX:
        qinfo = F.broadcast(qinfo)
    q2 = queries.join(qinfo, "q_id", "left")
    ring_q = q2.where(
        F.col("_rf").isNotNull() & (F.col("_rf") > r0) & (F.col("_rf") <= RING_MAX)
    )
    brute_q = q2.where(F.col("_rf").isNull() | (F.col("_rf") > RING_MAX))

    # phase-2 gate uses the WORST-CASE bound (every query escalating to
    # RING_MAX rings): the true escalated count isn't knowable without an
    # extra action, and an unconditional hint re-creates the multi-GB
    # forced-broadcast failure on clustered corpora where most queries
    # overflow r0. When the gate withholds the hint but the escalated side
    # is actually small, AQE's runtime join re-planning converts the
    # shuffle join back to a broadcast join from the materialized
    # exchange stats — safe both ways, the hint is only a fast path.
    cand2 = _ring_candidates(
        ring_q.select("q_id", "qlat", "qlon", "_rf"),
        pages,
        g,
        F.col("_rf"),
        exploded_rows_est=n_queries * (2 * RING_MAX + 1) ** 2,
    )
    # (q_id, doc_id) is already unique in cand2: ring_cells_col emits each
    # in-bounds cell id exactly once (offsets are clipped, never wrapped),
    # and a page lives in one cell — so no dedup pass is needed before the
    # top-k window (the old dropDuplicates cost an extra (q_id, doc_id)
    # exchange + two aggregates for rows that could not repeat)
    out_ring = (
        cand2.withColumn("rank", F.row_number().over(w))
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
    return out_done.unionByName(out_ring).unionByName(out_brute)
