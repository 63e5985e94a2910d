"""Two-parallelism scaling run — the sandbox evidence for the north rule's
N→4N executor criterion (BASELINE.json: efficiency ≥ 0.8).

Runs bench.py in fresh JVMs at local[8] and local[32] on identical input,
computes throughput at both and the scaling efficiency
eff = (docs_per_sec_32 / docs_per_sec_8) / 4, and appends the results to
BENCH_SCALING.md.

Usage: python tools/scaling_bench.py [--expand N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, expand: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_EXPAND"] = str(expand)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=900,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at cpus={cpus}: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def main():
    expand = int(sys.argv[sys.argv.index("--expand") + 1]) if "--expand" in sys.argv else 200
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_bench(cpus, expand, sf_dir)
        print(f"cpus={cpus}: {results[cpus]}  ({time.time()-t0:.0f}s total)", flush=True)

    thr8 = results[8]["docs_per_sec_zonal"]
    thr32 = results[32]["docs_per_sec_zonal"]
    eff = (thr32 / thr8) / 4.0
    # suite-wall efficiency over the parallel-friendly queries (exclude
    # fixed-overhead-dominated ones if any); headline uses the flagship.
    wall8 = results[8]["value"]
    wall32 = results[32]["value"]
    eff_wall = (wall8 / wall32) / 4.0

    summary = {
        "docs_per_sec_local8": thr8,
        "docs_per_sec_local32": thr32,
        "scaling_efficiency_zonal": round(eff, 3),
        "suite_wall_local8_s": wall8,
        "suite_wall_local32_s": wall32,
        "scaling_efficiency_suite_wall": round(eff_wall, 3),
        "n_pages": results[32]["n_pages"],
        "sf_dir": sf_dir,
    }
    print(json.dumps(summary))

    md = f"""
## Scaling run {time.strftime('%Y-%m-%d %H:%M')}

Same job (bench.py suite, {results[32]['n_pages']:,} synthetic pages from {sf_dir})
at two parallelism levels, fresh JVM each (the sandbox stand-in for N vs 4N
executors per BASELINE.json north_rule):

| config | flagship zonal docs/sec | suite wall (s) | per-query (s) |
|---|---|---|---|
| local[8]  | {thr8:,.0f} | {wall8} | {json.dumps(results[8]['queries'])} |
| local[32] | {thr32:,.0f} | {wall32} | {json.dumps(results[32]['queries'])} |

**Scaling efficiency (8→32 cores, ideal 4.0×):**
- flagship zonal throughput: {thr32/thr8:.2f}× → efficiency **{eff:.2f}**
- whole suite wall:          {wall8/wall32:.2f}× → efficiency **{eff_wall:.2f}**

Conf: AQE on, shuffle partitions = cores, broadcast geometry side,
salting factor 8 on q3.
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
