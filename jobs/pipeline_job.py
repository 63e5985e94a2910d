"""Cluster job: end-to-end training-data curation pipeline.

    spark-submit --py-files dist/rasters_jl_spark.zip jobs/pipeline_job.py \
        --docs <parquet path | iceberg:cat.db.table> --out <output dir> \
        [--min-quality 0.5] [--lang en] [--jaccard 0.5] [--sample N] \
        [--snapshot-id N] [--eval-docs <parquet path>] [--split] \
        [--c4] [--gopher] [--dup-ngrams] [--pii] [--strip-spans] \
        [--mix-rates '{"src0":2.5}']

The composite curation flow a 100 TB pretraining corpus goes through,
chained from the engine's individually-oracled operators:

    score     quality features + language-ID            (pure codegen)
    filter    quality ≥ threshold AND predicted lang    (pushed predicates)
    c4        optional C4 line-level cleaning: filter
              lines, REWRITE text, gate pages — runs
              BEFORE dedup, so exact/near dedup hash
              the cleaned text (docs differing only in
              stripped boilerplate collapse)
              (Raffel et al. 2020 §2.2)                 (pure codegen)
    exact     md5 groups → keep min-doc_id per group    (one hash groupBy)
    near      MinHash b×r LSH → verified pairs →
              connected components → keep component
              representative                            (bucketed, capped)
    decon     optional eval-set decontamination:
              drop docs sharing an n-gram with
              --eval-docs                               (broadcast gram set)
    gopher    optional Gopher A1 quality/repetition
              filter (Rae et al. 2021)                  (pure codegen)
    dupgrams  optional duplicate 5..10-gram char-
              fraction gate (the A1 scan tier)          (doc-keyed windows)
    strip     optional ExactSubstr duplicated-span
              removal (Lee et al. 2021 cut policy)      (one doc_id join)
    pii       optional email/IP/phone redaction         (pure codegen)
    sample    optional weighted downsample (A-ES)       (sort-limit top-n)
    split     optional deterministic train/val/test
              column (md5 per-mille buckets)            (pure projection)
    mix       optional per-source mixture sampling
              incl. epoch upsampling (rates > 1)        (map-side explode)

Each stage writes its row count into ``metrics``; the curated corpus is an
atomic overwrite under --out/corpus. Resumability = input pinning
(--snapshot-id with Iceberg) like dedup_job; every output path is a single
atomic overwrite, so a rerun is idempotent.

Stage maths: survivors join keepers with LEFT ANTI on the drop set — no
driver-side id collection; the drop sets stay DataFrames end-to-end.
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
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--eval-docs", default=None)
    ap.add_argument("--split", action="store_true")
    ap.add_argument("--c4", action="store_true",
                    help="C4 line-level cleaning: filter lines, rewrite text, gate "
                         "pages. NOTE: published rules require terminal-punctuation "
                         "prose — they legitimately reject the synthetic "
                         "punctuation-free fixture entirely (same class as the "
                         "Gopher stop-word gate)")
    ap.add_argument("--c4-min-words", type=int, default=5,
                    help="min words per surviving line (C4 default 5)")
    ap.add_argument("--c4-min-sentences", type=int, default=3,
                    help="min sentences per surviving page (C4 default 3)")
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--gopher-min-stops", type=int, default=None,
                    help="override the English-prose stop-word rule (default: published 2)")
    ap.add_argument("--gopher-min-words", type=int, default=None)
    ap.add_argument("--dup-ngrams", action="store_true",
                    help="gate on the duplicate 5..10-gram char fractions (Gopher A1 repetition tier)")
    ap.add_argument("--pii", action="store_true")
    ap.add_argument("--strip-spans", action="store_true")
    ap.add_argument("--mix-rates", default=None, help="JSON {source: rate}; rates > 1 upsample")
    ap.add_argument("--mix-default", type=float, default=1.0)
    ap.add_argument("--blocklist", default=None,
                    help="comma-separated terms; docs containing any are dropped (C4 policy)")
    ap.add_argument("--blocklist-mode", default="word", choices=["word", "substring"])
    args = ap.parse_args()

    spark = SparkSession.builder.appName("rasters_jl_spark.pipeline").getOrCreate()

    from rasters_jl_spark.functions.dedup import (
        connected_components,
        exact_dedup_groups,
        minhash_dedup_pairs,
    )
    from rasters_jl_spark.functions.textstats import lang_id, quality_score
    from rasters_jl_spark.operators.sample import sample_weighted
    from rasters_jl_spark.sources.catalog import read_table

    t0 = time.time()
    table = read_table(spark, args.docs, snapshot_id=args.snapshot_id)
    base_cols = ["doc_id", "text", "n_chars"]
    if args.mix_rates:
        # fail FAST: mixture sampling keys on source; discovering the
        # missing column at the final write would waste the whole run
        if "source" not in table.columns:
            raise SystemExit(
                "--mix-rates requires a 'source' column on --docs "
                f"(columns: {table.columns})"
            )
        base_cols.append("source")
    docs = table.select(*base_cols)
    n_in = docs.count()

    # -- score + filter (one pass; the two scorers share the token split) --
    q = quality_score(docs).select("doc_id", "quality")
    lg = lang_id(docs).select("doc_id", "lang_pred")
    kept = (
        docs.join(q, "doc_id")
        .join(lg, "doc_id")
        .where((F.col("quality") >= args.min_quality) & (F.col("lang_pred") == args.lang))
        .select(*base_cols)
    )
    # -- optional C4 line-level cleaning (Raffel et al. 2020 §2.2):
    #    drops boilerplate/code lines, REWRITES text to the surviving
    #    lines, and gates pages on sentence count / lorem ipsum / '{' --
    if args.c4:
        from rasters_jl_spark.functions.textstats import c4_clean

        other = [c for c in base_cols if c not in ("doc_id", "text", "n_chars")]
        kept = (
            c4_clean(
                kept,
                min_words_per_line=args.c4_min_words,
                min_sentences=args.c4_min_sentences,
                keep=tuple(other),  # passthrough — no corpus self-join
            )
            .where(F.col("c4_pass"))
            .select("doc_id", F.col("clean_text").alias("text"), *other)
            # c4 rewrites text BY CONTRACT — keep n_chars honest (the
            # later strip/pii recompute can't see this stage)
            .withColumn("n_chars", F.length("text"))
            .select(*base_cols)
        )
    # -- optional blocklist gate (C4 drop policy) --
    if args.blocklist:
        from rasters_jl_spark.functions.blocklist import blocklist_filter

        terms = tuple(t.strip() for t in args.blocklist.split(",") if t.strip())
        kept = blocklist_filter(kept, terms, mode=args.blocklist_mode)
    # -- optional Gopher A1 quality/repetition gate --
    if args.gopher:
        from rasters_jl_spark.functions.textstats import (
            GOPHER_MIN_STOPS,
            GOPHER_MIN_WORDS,
            gopher_signals,
        )

        gp = gopher_signals(
            kept,
            min_words=args.gopher_min_words if args.gopher_min_words is not None else GOPHER_MIN_WORDS,
            min_stops=args.gopher_min_stops if args.gopher_min_stops is not None else GOPHER_MIN_STOPS,
        ).where(F.col("gopher_pass")).select("doc_id")
        kept = kept.join(gp, "doc_id", "left_semi")
    # -- optional duplicate 5..10-gram repetition gate (the scan-requiring
    #    Gopher A1 tier; run AFTER the cheap zero-shuffle battery) --
    if args.dup_ngrams:
        from rasters_jl_spark.functions.textstats import dup_ngram_char_fracs

        rp = (
            dup_ngram_char_fracs(kept)
            .where(F.col("repetition_pass"))
            .select("doc_id")
        )
        kept = kept.join(rp, "doc_id", "left_semi")
    n_filtered = kept.count()

    # -- exact dedup: drop every row of a dup group except the keeper --
    groups = exact_dedup_groups(kept, F.md5(F.col("text")), min_count=2)
    dup_rows = kept.select(F.md5(F.col("text")).alias("dup_key"), "doc_id").join(
        groups.select("dup_key", "keeper"), "dup_key"
    )
    exact_drops = dup_rows.where(F.col("doc_id") != F.col("keeper")).select("doc_id")
    after_exact = kept.join(exact_drops, "doc_id", "left_anti")
    n_exact = after_exact.count()

    # -- near-dup: verified pairs → components → drop non-representatives --
    pairs = minhash_dedup_pairs(after_exact, threshold=args.jaccard)
    comp = connected_components(pairs)
    near_drops = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    curated = after_exact.join(near_drops, "doc_id", "left_anti")
    n_near = curated.count()

    # -- optional eval-set decontamination (same LEFT ANTI shape) --
    n_decon = n_near
    if args.eval_docs:
        from rasters_jl_spark.functions.dedup import decontaminate

        contaminated = decontaminate(curated, spark.read.parquet(args.eval_docs)).select(
            "doc_id"
        )
        curated = curated.join(contaminated, "doc_id", "left_anti")
        n_decon = curated.count()

    # -- optional ExactSubstr duplicated-span removal (cut policy) --
    text_rewritten = False
    if args.strip_spans:
        from rasters_jl_spark.functions.dedup import duplicated_spans, remove_spans

        spans = duplicated_spans(curated)
        curated = remove_spans(curated, spans)
        text_rewritten = True
    # -- optional PII redaction --
    n_pii = 0
    if args.pii:
        from rasters_jl_spark.functions.pii import redact_pii

        curated = redact_pii(curated)
        n_pii = int(
            curated.agg(
                F.sum(F.col("n_email") + F.col("n_ip") + F.col("n_phone")).cast("long")
            ).first()[0]
            or 0
        )
        curated = curated.drop("n_email", "n_ip", "n_phone")
        text_rewritten = True
    if text_rewritten:
        # rewrite stages change bytes BY CONTRACT — keep n_chars honest
        curated = curated.withColumn("n_chars", F.length("text"))
    # -- optional weighted downsample --
    if args.sample:
        curated = sample_weighted(curated, args.sample, weight_col="n_chars")
    # -- optional deterministic split column --
    if args.split:
        from rasters_jl_spark.operators.sample import split_by_hash

        curated = split_by_hash(curated)
    # -- optional per-source mixture sampling (rates > 1 upsample) --
    if args.mix_rates:
        import json as _json

        from rasters_jl_spark.operators.sample import mixture_sample_epochs

        curated = mixture_sample_epochs(
            curated, _json.loads(args.mix_rates), default_rate=args.mix_default
        )
    curated.write.mode("overwrite").parquet(f"{args.out}/corpus")
    n_out = spark.read.parquet(f"{args.out}/corpus").count()

    wall = round(time.time() - t0, 3)
    metrics = spark.createDataFrame(
        [(n_in, n_filtered, n_exact, n_near, n_decon, n_out, wall)],
        "n_input long, n_after_filter long, n_after_exact long,"
        " n_after_neardup long, n_after_decon long, n_output long, wall_s double",
    )
    metrics.write.mode("overwrite").parquet(f"{args.out}/metrics")
    pii_note = f" (pii matches redacted: {n_pii})" if args.pii else ""
    print(
        f"pipeline: {n_in} -> filter {n_filtered} -> exact {n_exact} "
        f"-> neardup {n_near} -> decon {n_decon} -> out {n_out} in {wall}s{pii_note}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
