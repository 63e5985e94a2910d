"""Weighted sampling — `Rasters.sample` (`ext/RastersStatsBaseExt/sample.jl:
29-93`): weighted random sampling of cells/rows without replacement.

Spark-native: the A-ExpJ / Efraimidis–Spirakis trick — key = u^(1/w) with u
a *deterministic per-row pseudo-random* derived from the row id by integer
arithmetic (so the DuckDB oracle reproduces the exact same sample; Spark's
``rand(seed)`` is not portable across engines). Top-n by key = the weighted
sample; a single orderBy+limit (at scale: ``row_number`` window over a
1-partition-free top-k via `F.max_by`-style partial aggregation — Spark's
sort-limit already does partial top-k per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic uniform in (0,1): multiplicative hash then scale
U_MULT = 48271
U_MOD = 2147483647  # 2^31-1 (Lehmer)


def u_col(row_id) -> F.Column:
    return ((row_id * F.lit(U_MULT) + F.lit(11)) % F.lit(U_MOD) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(U_MOD + 2))


def u_sql(row_id: str) -> str:
    return f"CAST((({row_id}) * {U_MULT} + 11) % {U_MOD} + 1 AS DOUBLE) / {float(U_MOD + 2)!r}"


def sample_weighted(
    df: DataFrame, n: int, weight_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """n rows sampled without replacement, P(row) ∝ weight. Deterministic.

    key = ln(u)/w  (monotone transform of u^(1/w); avoids pow underflow),
    take the n largest keys.
    """
    key = F.log(u_col(F.col(id_col))) / F.col(weight_col)
    return (
        df.withColumn("_samp_key", key)
        .orderBy(F.col("_samp_key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("_samp_key")
    )
