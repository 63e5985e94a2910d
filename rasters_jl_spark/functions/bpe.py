"""Byte-pair encoding — learned subword vocabulary (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units"): iteratively merge the most frequent adjacent symbol pair.

Distributed shape: training operates on the DISTINCT-WORD frequency table
(one corpus-wide groupBy builds it — at web scale ~10⁸ rows vs 10¹²
tokens; this is how production BPE trainers work too). Each merge round is
one zip_with pair-explode + partial-aggregated groupBy over that table;
the argmax is a single-row driver collect per round (same documented class
as the k-means/connected-components round loop), and the merge itself is
a left-to-right greedy fold (F.aggregate — no Python, no UDF). Per-round
``localCheckpoint`` truncates the lineage so round R's plan doesn't embed
R copies of the training DAG.

Determinism: ties in pair frequency break by (left, right) lexicographic —
both engines produce the identical merge sequence, so the DuckDB oracle
replicates training round-for-round (recursive-CTE folds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 8  # sandbox rounds (30k-50k in production — a parameter)


def chars_col(word: Column) -> Column:
    """Initial symbol sequence: the word's characters. (No end-of-word
    marker — the fixture vocabulary is whitespace-tokenized words, so
    word boundaries are already explicit; production BPE appends '</w>'
    by the same column op.)"""
    return F.split(word, "")


def sym_pairs_col(syms: Column) -> Column:
    """array<struct<l,r>> of ADJACENT symbol pairs — linear-time zip_with
    over two shifted slices (house rule: transform lambdas re-evaluate
    captured expressions per element)."""
    n = F.size(syms)
    a = F.slice(syms, 1, F.greatest(n - 1, F.lit(0)))
    b = F.slice(syms, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(a, b, lambda x, y: F.struct(x.alias("l"), y.alias("r")))


def apply_merge_col(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of (left, right) → left||right: a fold
    whose accumulator replaces its last element when it equals ``left``
    and the incoming symbol equals ``right``. Merged output can't cascade
    within the round (acc's last becomes left||right ≠ left) — exactly
    the reference BPE semantics, overlaps included ('aaaa' → aa aa)."""
    merged = F.array(F.lit(left + right))
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): the distinct-word frequency table — the ONLY corpus-wide
    pass in BPE training."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, merges_df) where
    merges is [(round, left, right, pair_freq)] in application order and
    merges_df is the same as a DataFrame (the registry/oracle surface)."""
    spark = docs.sparkSession
    state = (
        word_freqs(docs, text_col)
        .select("w", "freq", chars_col(F.col("w")).alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        counts = (
            state.select("freq", F.explode(sym_pairs_col(F.col("syms"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("f"))
        )
        best = counts.orderBy(F.col("f").desc(), F.col("l").asc(), F.col("r").asc()).first()
        if best is None:
            break
        merges.append((r, best["l"], best["r"], int(best["f"])))
        state = state.withColumn(
            "syms", apply_merge_col(F.col("syms"), best["l"], best["r"])
        ).localCheckpoint(eager=False)
    df = spark.createDataFrame(
        merges, "round int, left string, right string, pair_freq bigint"
    )
    return merges, df


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens): apply the learned merges in order to every word —
    n_merges chained folds NESTED inside one transform over the word
    array, so the whole tokenizer is a single JVM expression tree: no
    explode, no shuffle, word order preserved by construction. (The
    transform lambda only touches its own variable — no captured-column
    re-evaluation, per the house zip_with rule. A production tokenizer
    would push the final vocab into a trie UDF; the fold chain is the
    reference semantics.)"""

    def _tok(w: Column) -> Column:
        s = chars_col(w)
        for _r, left, right, _f in merges:
            s = apply_merge_col(s, left, right)
        return s

    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.flatten(F.transform(words, _tok)).alias("tokens"),
    )
