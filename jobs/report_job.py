"""Cluster job: one-stop corpus data card.

    spark-submit --py-files dist/rasters_jl_spark.zip jobs/report_job.py \
        --docs <parquet path | iceberg:cat.db.table> --out <output dir> \
        [--snapshot-id N]

Aggregates the engine's individually-oracled signal operators into the
summary tables a dataset release ships with (the "data card" numbers):

    sources    per-source doc/char counts
    langs      predicted-language distribution
    quality    quality-score decile histogram
    gopher     Gopher A1 signal aggregates + pass rate
    pii        scrub-volume totals (matches found per type)
    dedup      exact-dup group count, MinHash candidate-pair count
    tokens     whitespace + BPE-estimate token totals

Every table is a small aggregate (map-side partial everywhere); the whole
report is a handful of corpus passes with nothing collected to the driver
except the printed summary row. Output: one parquet dir per table under
--out, atomic overwrite each — reruns are idempotent.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--snapshot-id", type=int, default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("rasters_jl_spark.report").getOrCreate()

    from rasters_jl_spark.functions.dedup import exact_dedup_groups, minhash_candidate_pairs
    from rasters_jl_spark.functions.pii import redact_pii
    from rasters_jl_spark.functions.textstats import (
        gopher_signals,
        lang_id,
        quality_score,
        token_count,
    )
    from rasters_jl_spark.sources.catalog import read_table

    t0 = time.time()
    docs = read_table(spark, args.docs, snapshot_id=args.snapshot_id)
    n_docs = docs.count()
    if n_docs == 0:
        # a data card for an empty (possibly broken) output dir should be
        # zeros, not a NULL-row schema-inference stack trace
        spark.createDataFrame(
            [(0, 0, 0, 0, 0)],
            "n_docs long, exact_dup_groups long, minhash_candidate_pairs long,"
            " ws_tokens long, bpe_est_tokens long",
        ).write.mode("overwrite").parquet(f"{args.out}/dedup_tokens")
        print("report: 0 docs (empty input) — zero data card written")
        spark.stop()
        return

    # -- per-source + language distributions --
    if "source" in docs.columns:
        src = docs.groupBy("source").agg(
            F.count("*").alias("n_docs"), F.sum(F.length("text")).alias("sum_chars")
        )
        src.write.mode("overwrite").parquet(f"{args.out}/sources")
    langs = lang_id(docs).groupBy("lang_pred").agg(F.count("*").alias("n_docs"))
    langs.write.mode("overwrite").parquet(f"{args.out}/langs")

    # -- quality decile histogram (score 1.0 clamps into decile 9) --
    q = quality_score(docs).select(
        F.least(F.floor(F.col("quality") * 10), F.lit(9)).cast("int").alias("decile")
    )
    qh = q.groupBy("decile").agg(F.count("*").alias("n_docs"))
    qh.write.mode("overwrite").parquet(f"{args.out}/quality")

    # -- Gopher signals: aggregates + pass rate --
    # single-row aggregates: run the corpus pass ONCE (.first()), then
    # write the collected row — a .write plus a .first() on the same
    # uncached plan would execute the full pass twice
    g = gopher_signals(docs)
    gagg_df = g.agg(
        F.round(F.avg("n_words"), 3).alias("avg_words"),
        F.round(F.avg("mean_word_len"), 6).alias("avg_word_len"),
        F.round(F.avg("top2gram_char_frac"), 6).alias("avg_top2_frac"),
        F.round(F.avg("dup_line_frac"), 6).alias("avg_dup_line_frac"),
        F.round(F.avg(F.col("gopher_pass").cast("int")), 6).alias("pass_rate"),
    )
    grow = gagg_df.first()
    spark.createDataFrame([grow], gagg_df.schema).write.mode("overwrite").parquet(f"{args.out}/gopher")
    gopher_pass_rate = grow["pass_rate"]

    # -- PII scrub volume (counts only; text untouched) --
    pii_df = redact_pii(docs).agg(
        F.sum("n_email").cast("long").alias("n_email"),
        F.sum("n_ip").cast("long").alias("n_ip"),
        F.sum("n_phone").cast("long").alias("n_phone"),
    )
    pii_row = pii_df.first()
    spark.createDataFrame([pii_row], pii_df.schema).write.mode("overwrite").parquet(f"{args.out}/pii")

    # -- dedup pressure: exact groups + near-dup candidate pairs --
    n_exact_groups = exact_dedup_groups(docs, F.md5(F.col("text")), min_count=2).count()
    n_cand_pairs = minhash_candidate_pairs(docs).count()
    # -- token totals --
    toks = token_count(docs).agg(
        F.sum("n_tokens").cast("long").alias("ws_tokens"),
        F.sum("bpe_est").cast("long").alias("bpe_est_tokens"),
    )
    tok_row = toks.first()
    dd = spark.createDataFrame(
        [(n_docs, n_exact_groups, n_cand_pairs, int(tok_row["ws_tokens"]), int(tok_row["bpe_est_tokens"]))],
        "n_docs long, exact_dup_groups long, minhash_candidate_pairs long,"
        " ws_tokens long, bpe_est_tokens long",
    )
    dd.write.mode("overwrite").parquet(f"{args.out}/dedup_tokens")

    wall = round(time.time() - t0, 3)
    print(
        f"report: {n_docs} docs, {int(tok_row['ws_tokens'])} ws-tokens, "
        f"gopher pass {gopher_pass_rate}, pii {int(pii_row['n_email'])}/"
        f"{int(pii_row['n_ip'])}/{int(pii_row['n_phone'])}, "
        f"{n_exact_groups} exact-dup groups, {n_cand_pairs} near-dup candidates "
        f"in {wall}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
