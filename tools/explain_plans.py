"""Plan inspection: .explain('formatted') for the headline queries — verify
broadcast joins on geometry sides, pushed filters, whole-stage codegen, and
absence of unnecessary shuffles/Python evals.

Usage: python tools/explain_plans.py [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

INTERESTING = [
    "zonal_pages", "spatial_join_pip", "knn", "resample_bilinear",
    "aggregate_mean", "dedup_minhash", "ann_brute", "focal_mean", "rasterize_points",
]


def summarize(plan: str, simple: str) -> str:
    counts = {
        "ShuffleExchange": len(re.findall(r"hashpartitioning|rangepartitioning", plan)),
        "BroadcastExchange": len(re.findall(r"BroadcastExchange", plan)),
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", plan)),
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", plan)),
        "BroadcastNestedLoop": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        # simple-mode FINAL plan (post-execution, AQE) marks whole-stage-
        # codegen stages as *(N); formatted/AQE omits `codegen id` entirely
        "CodegenSpans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "Python/ArrowEval": len(re.findall(r"ArrowEvalPython|BatchEvalPython|PythonUDF", plan)),
        "PushedFilters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "HashAggregate": len(re.findall(r"\) HashAggregate", plan)),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items())


def main(names):
    from rasters_jl_spark.registry import REGISTRY
    from rasters_jl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names or INTERESTING:
        fn, _ = REGISTRY[name]
        df = fn(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        df.collect()  # execute THIS df so AQE finalizes (count() would wrap a new plan)
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            df.explain()
        simple = buf2.getvalue()
        print(f"\n===== {name} =====")
        print(summarize(plan, simple))
        if "-v" in sys.argv:
            print(plan)
            print(simple)


if __name__ == "__main__":
    main([a for a in sys.argv[1:] if not a.startswith("-")])
