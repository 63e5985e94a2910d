"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The engine's authoritative metric (BASELINE.json) is spatial-join +
zonal-stats throughput in docs/sec. The documents table is small at test
scale, so the page corpus is expanded deterministically (doc_id' =
doc_id + rep*REP_STRIDE, geotag hash applied to the expanded id — pure
column math, no driver data) to EXPAND× rows before the pipeline runs.

Scaling evidence (north rule, N→4N executors ≥ 0.8): run
``tools/scaling_bench.py`` which executes this file at SPARK_GRAFT_CPUS=8
and 32 in fresh JVMs and reports efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from rasters_jl_spark import fixtures as FX  # noqa: E402
from rasters_jl_spark.grid import PAGES_RES, TILE_RES, WebGrid  # noqa: E402
from rasters_jl_spark.operators.knn import knn_pages  # noqa: E402
from rasters_jl_spark.operators.zonal import spatial_join_pages, zonal_pages  # noqa: E402
from rasters_jl_spark.session import get_spark  # noqa: E402
from rasters_jl_spark.sources.pages import lat_col, lon_col  # noqa: E402

EXPAND = int(os.environ.get("SPARK_GRAFT_BENCH_EXPAND", "200"))
# prime stride keeps the hash well-mixed; bounded so that the largest
# expanded doc_id (≈ EXPAND * stride) × 2654435761 stays inside int64
REP_STRIDE = 1_000_003


def expanded_pages(spark, sf_dir: str):
    """documents × EXPAND with re-hashed geotags — deterministic synthetic
    corpus of EXPAND×n_docs pages.

    The replication axis is a partitioned ``spark.range`` (the documents
    parquet is a single small file = ONE scan partition; exploding it would
    leave the whole corpus in one task — the classic small-dim × big-fanout
    trap). ``range ⨯ broadcast(docs)`` spreads the fan-out over all cores,
    exactly like a real 10¹²-row table arrives already partitioned."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    g = WebGrid(PAGES_RES)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = spark.range(0, EXPAND, 1, numPartitions=cpus * 2).select(F.col("id").alias("rep"))
    p = reps.join(F.broadcast(docs)).select(
        (F.col("doc_id") + F.col("rep") * F.lit(REP_STRIDE).cast("long")).alias("doc_id"),
        "n_chars",
    )
    p = p.withColumn("lat", lat_col(F.col("doc_id"))).withColumn("lon", lon_col(F.col("doc_id")))
    p = p.withColumn("cell", g.cell_col(F.col("lon"), F.col("lat")))
    p = p.withColumn("tile_id", g.parent_cell_col(F.col("cell"), TILE_RES))
    return p


def bench(fn, *args, **kwargs):
    t0 = time.perf_counter()
    n = fn(*args, **kwargs)
    return time.perf_counter() - t0, n


TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
JVM_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_JVMS", "2"))


def bench_min(fn, trials: int = TRIALS):
    """Min wall over fresh invocations. ``fn`` must REBUILD its DataFrame
    per call — re-collecting the same DF object reuses AQE shuffle output
    and the second trial measures nothing. Min-of-3 (default) discards the
    JIT-cold first trial and one GC/contention outlier; the box swings
    single-shot timings ±20-45% (BASELINE.md round-2 note)."""
    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def synthetic_docs(spark, n_docs: int, cpus: int):
    """n unrelated 50-token documents from pure column math (no data
    files): token v of doc d = md5(d || '_' || v)[:8]. md5 tokens carry no
    arithmetic structure, so cross-doc shingle matches are birthday-rare
    and the scaling run measures signature/bucket throughput, not a
    pathological near-dup pair blow-up (an arithmetic-progression token
    formula made whole congruence classes of docs near-identical)."""
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(49)),
        lambda i: F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit("_"), i.cast("string"))), 1, 8
        ),
    )
    return spark.range(0, n_docs, 1, numPartitions=cpus * 2).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )


def scaling_main():
    """--scaling: warm up, then time the selected job 3×; print min wall +
    docs/sec. Called in fresh JVMs by tools/scaling_bench.py — min-of-trials
    in a dedicated JVM is the only stable measurement on a shared box
    (JIT + GC variance swamps single-shot timings).

    SPARK_GRAFT_SCALING_JOB: 'zonal' (flagship, default), 'minhash'
    (training-data dedup path), 'decon' (eval-set decontamination:
    broadcast gram set + map-side corpus explode), or 'pack' (sequence
    packing: distributed prefix sum + chunk explode)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    job = os.environ.get("SPARK_GRAFT_SCALING_JOB", "zonal")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if job == "minhash":
        from rasters_jl_spark.functions.dedup import minhash_dedup_pairs

        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_NDOCS", "200000"))

        def run():
            minhash_dedup_pairs(synthetic_docs(spark, n_docs, cpus)).count()

    elif job == "pack":
        from rasters_jl_spark.functions.packing import pack_sequences

        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_NDOCS", "400000"))

        def run():
            pack_sequences(synthetic_docs(spark, n_docs, cpus), seq_len=128, n_parts=cpus).count()

    elif job == "curate":
        # the map-only curation pass: Gopher signals + PII redaction over
        # every doc — pure codegen, the embarrassingly-parallel floor the
        # other (shuffle-bearing) jobs are measured against
        from rasters_jl_spark.functions.pii import redact_pii
        from rasters_jl_spark.functions.textstats import gopher_signals

        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_NDOCS", "400000"))

        def run():
            d = synthetic_docs(spark, n_docs, cpus)
            g = gopher_signals(d, min_stops=1).where(F.col("gopher_pass")).select("doc_id")
            redact_pii(d.join(g, "doc_id", "left_semi")).count()

    elif job == "warc":
        # crawl-container ingest: the unit of parallelism is the SHARD
        # (one Arrow task per container — the only parallelism a
        # non-splittable record container admits). Shards are packed once
        # (cached, outside timing, both layouts); the timed job is the
        # record splitter + count, i.e. the per-shard parse throughput a
        # 1M-shard Common Crawl ingest is made of.
        from rasters_jl_spark.sources.warc import parse_warc, synth_warc

        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_NDOCS", "100000"))
        per_file = int(os.environ.get("SPARK_GRAFT_WARC_PER_FILE", "200"))
        files = synth_warc(
            synthetic_docs(spark, n_docs, cpus), per_file=per_file,
            limit=n_docs, gzip_every=2,
        ).cache()
        files.count()  # materialize the shard payloads outside the timing

        def run():
            parse_warc(files).count()

    elif job == "sessions":
        # gap-session rollup: the native session_window aggregate over a
        # synthetic event stream — one (key, merged-window) shuffle with
        # map-side partial merging, the minimum the semantics admit
        from rasters_jl_spark.operators.sessionize import sessionize

        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_NDOCS", "2000000"))
        n_users = max(1000, n_docs // 200)

        def run():
            ev = spark.range(n_docs, numPartitions=cpus).select(
                (F.col("id") % n_users).alias("user_id"),
                F.timestamp_micros(
                    F.lit(1735689600000000)  # 2025-01-01 UTC
                    + (F.col("id") * 97 % 86400) * 1000000
                    + F.col("id") * 13 % 1000000
                ).alias("ts"),
                ((F.col("id") % 997) / 7.0).alias("value"),
            )
            sessionize(ev).count()

    elif job == "decon":
        from pyspark.sql import functions as FN

        from rasters_jl_spark.functions.dedup import decontaminate

        n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_NDOCS", "200000"))
        # eval set = 16-token windows of the first 1% of the corpus
        # (synthetic_docs regenerates the deterministic id prefix, so the
        # planted contamination sits in the low-id range — fine for a
        # throughput measurement, NOT uniformly spread)
        ev = synthetic_docs(spark, n_docs // 100, cpus).select(
            FN.concat_ws(" ", FN.slice(FN.split(FN.col("text"), " "), 2, 16)).alias("text")
        )

        def run():
            decontaminate(synthetic_docs(spark, n_docs, cpus), ev).count()

    else:
        pages = expanded_pages(spark, sf_dir)
        n_docs = pages.count()

        def run():
            zonal_pages(expanded_pages(spark, sf_dir), FX.POLYS_GEO).collect()

    run()  # warm: JIT + broadcast + plans
    walls = []
    for _ in range(3):
        t, _n = bench(run)
        walls.append(t)
    best = min(walls)
    print(
        json.dumps(
            {
                "metric": f"{job}_wall_min3",
                "value": round(best, 3),
                "unit": "sec",
                "queries": {f"q_{job}": round(best, 3)},
                "n_pages": n_docs,
                "cpus": cpus,
                "walls": [round(w, 3) for w in walls],
                f"docs_per_sec_{job}": round(n_docs / best, 1),
            }
        )
    )


def child_main():
    """One fresh-JVM suite pass (min-of-TRIALS per query); the parent takes
    the per-query min ACROSS passes."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    queries: dict[str, float] = {}

    # warm the scan once; n_docs also used for docs/sec
    n_docs = expanded_pages(spark, sf_dir).count()

    # Every thunk rebuilds its DataFrame from scratch (fresh logical plan)
    # so AQE shuffle reuse never short-circuits a trial; min of 2 trials
    # absorbs JIT/GC noise on the shared box.
    def fresh_pages():
        return expanded_pages(spark, sf_dir)

    # q1 flagship: geotag → cell assign → cover join + PIP → zonal agg
    t = bench_min(lambda: zonal_pages(fresh_pages(), FX.POLYS_GEO, value_col="n_chars").collect())
    queries["q1_zonal_pipeline"] = round(t, 3)
    docs_per_sec = n_docs / t

    # q2: raw spatial join row count (join + PIP, no agg)
    t = bench_min(lambda: spatial_join_pages(fresh_pages(), FX.POLYS_GEO).count())
    queries["q2_spatial_join"] = round(t, 3)

    # q3: salted flagship (skew path)
    t = bench_min(lambda: zonal_pages(fresh_pages(), FX.POLYS_GEO, n_salt=8).collect())
    queries["q3_zonal_salted"] = round(t, 3)

    # q4: kNN ring expansion, 50 queries. The input corpus is cached: on a
    # real cluster this is a column-pruned parquet scan; here the synthetic
    # expansion would otherwise dominate the operator being measured.
    p_knn = expanded_pages(spark, sf_dir).select("doc_id", "lat", "lon", "cell").cache()
    p_knn.count()
    ids = spark.range(FX.KNN_ID_BASE, FX.KNN_ID_BASE + 50)
    qdf = ids.select(
        (F.col("id") - FX.KNN_ID_BASE).alias("q_id"),
        lat_col(F.col("id")).alias("qlat"),
        lon_col(F.col("id")).alias("qlon"),
    )
    t = bench_min(
        lambda: knn_pages(
            qdf, p_knn, k=5, res=PAGES_RES, n_pages=n_docs, n_queries=50
        ).collect()
    )
    queries["q4_knn"] = round(t, 3)

    # q5: per-tile rollup (partition metrics table)
    t = bench_min(
        lambda: fresh_pages()
        .groupBy("tile_id")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    )
    queries["q5_tile_rollup"] = round(t, 3)

    # q6: minhash near-dup pairs on the raw documents table
    from rasters_jl_spark.queries_text import q_dedup_minhash

    t = bench_min(lambda: q_dedup_minhash(spark, sf_dir).count())
    queries["q6_dedup_minhash"] = round(t, 3)

    total = sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "pipeline_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_pages": n_docs,
                "cpus": cpus,
                "docs_per_sec_zonal": round(docs_per_sec, 1),
            }
        )
    )


def _burn_once(_arg=None) -> float:
    """One fixed single-threaded CPU burn; returns elapsed ms. Module-level
    so multiprocessing can pickle it for the parallel probe."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc += i * i
    return round((time.perf_counter() - t0) * 1e3, 1)


def _contention_probe() -> dict:
    """Ambient-contention sentinel: a fixed single-threaded CPU burn
    (pure-Python integer loop, ~100 ms idle) plus the 1-min loadavg. On an
    idle box the burn time is stable; a contended window inflates it, so
    a slow bench record carries its own diagnosis (r02 recorded 12.19 s
    and r04 8.85 s for plans measured at ~8.2 s on the idle box — both
    ambient, neither distinguishable from regression without this).

    ``par8_burn_ms`` is the wall time of 8 CONCURRENT burns in a
    pre-warmed process pool (GIL-free, fork overhead excluded): host
    steal can remove PARALLEL capacity while leaving a lone thread at
    full speed — r6 observed suite runs 34-41% slow on byte-identical
    plans with a QUIET single burn (~106 ms); in that same window par8
    read a stable 154-156 ms (1.55× single — matching the ~35-40% wall
    inflation), so this probe sees the steal mode the single burn is
    blind to. Idle expectation: par8 within ~1.2× the single burn.

    On hosts with < 8 cores a fixed pool of 8 MUST time-slice, so an idle
    box would exceed the par gate by construction and burn the full retry
    loop every run — the pool is sized min(8, cores) (recorded as
    ``par_workers``) so the idle expectation stays ~1× the single burn on
    any host."""
    single = _burn_once()
    n_cores = os.cpu_count() or 1
    n_par = min(8, n_cores)
    try:
        import multiprocessing as mp

        with mp.Pool(n_par) as pool:
            pool.map(int, range(n_par))  # warm-up: exclude fork/start overhead
            t0 = time.perf_counter()
            pool.map(_burn_once, range(n_par))
            par8 = round((time.perf_counter() - t0) * 1e3, 1)
    except Exception:
        par8 = None
    return {
        "burn_ms": single,
        "par8_burn_ms": par8,
        "par_workers": n_par,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }


def main():
    """Reproducible driver-facing bench: run the suite in JVM_RUNS fresh
    JVMs (taskset-pinned to the CPU budget when available) and report the
    per-query MIN across JVMs — the BENCH_SCALING.md discipline applied to
    bench.py itself. A shared box swings single-JVM suites 10.2 → 13.5 s
    with identical plans (BASELINE.md); best-of fresh JVMs × min-of-trials
    is the stable estimator of the plans' actual cost. A contention
    sentinel (CPU burn + loadavg, before and after) is logged in the JSON
    so slow windows are self-diagnosing."""
    import shutil
    import subprocess

    # Contention GATE (not just diagnosis): three driver records in a row
    # (r02/r04/r05) landed in host-steal windows. If the pre-run burn
    # exceeds the quiet-box threshold, sleep and re-probe a bounded number
    # of times before recording; if the window never clears, record anyway
    # but flag it. The probe history rides in the JSON either way.
    gate_ms = float(os.environ.get("SPARK_GRAFT_BENCH_BURN_GATE_MS", "135"))
    par_gate_ms = float(os.environ.get("SPARK_GRAFT_BENCH_PAR_GATE_MS", "140"))
    gate_retries = int(os.environ.get("SPARK_GRAFT_BENCH_GATE_RETRIES", "5"))
    gate_sleep = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_SLEEP_S", "45"))

    def _contended(p: dict) -> bool:
        if p["burn_ms"] > gate_ms:
            return True
        return p["par8_burn_ms"] is not None and p["par8_burn_ms"] > par_gate_ms

    probe_history = [_contention_probe()]
    while _contended(probe_history[-1]) and len(probe_history) <= gate_retries:
        time.sleep(gate_sleep)
        probe_history.append(_contention_probe())
    sentinel_before = probe_history[-1]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cmd = [sys.executable, os.path.abspath(__file__), "--child"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    runs = []
    for _ in range(JVM_RUNS):
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
        line = next(
            (l for l in reversed(proc.stdout.strip().splitlines()) if l.startswith("{")),
            None,
        )
        if line is None:
            sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-2000:] + "\n")
            raise RuntimeError("bench child produced no JSON line")
        runs.append(json.loads(line))
    queries = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    total = round(sum(queries.values()), 3)
    n_docs = runs[0]["n_pages"]
    out = dict(runs[0])
    out.update(
        {
            "value": total,
            "queries": queries,
            "docs_per_sec_zonal": round(n_docs / queries["q1_zonal_pipeline"], 1),
            "jvm_runs": JVM_RUNS,
            "trials_per_jvm": TRIALS,
            "per_jvm_totals": [r["value"] for r in runs],
            "sentinel": {
                "before": sentinel_before,
                "after": _contention_probe(),
                "gate_ms": gate_ms,
                "par_gate_ms": par_gate_ms,
                "probe_history_ms": [p["burn_ms"] for p in probe_history],
                "probe_history_par8_ms": [p["par8_burn_ms"] for p in probe_history],
                "recorded_under_contention": _contended(sentinel_before),
            },
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main()
    elif "--child" in sys.argv:
        child_main()
    else:
        main()
