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

# deterministic uniform in (0,1): 32-bit md5 prefix of the id string.
# (Previously a Lehmer multiplicative stream — monotonic in the id until
# the first modulus wrap, so small sequential id ranges sorted together
# and the A-ES top-n was id-biased instead of weight-driven. md5 mixes
# any id distribution; both engines compute the identical value.)
U_DENOM = 4294967297.0  # 2^32 + 1 → u ∈ (0, 1)


def u_col(row_id) -> F.Column:
    v = F.conv(F.substring(F.md5(row_id.cast("string")), 1, 8), 16, 10).cast("long")
    return (v + F.lit(1)).cast("double") / F.lit(U_DENOM)


def u_sql(row_id: str) -> str:
    return (
        f"(CAST(CAST(concat('0x', substr(md5(CAST(({row_id}) AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" + 1 AS DOUBLE) / {U_DENOM!r})"
    )


# per-(draw, row) uniform for replacement sampling: mixes the draw index
# into the id before hashing with a large odd multiplier (portable to SQL)
DRAW_MIX = 131071


def sample_weighted(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    replace: bool = False,
    ordered: bool = False,
) -> DataFrame:
    """n rows sampled P(row) ∝ weight. Deterministic in both engines.

    - ``replace=False`` (default): A-ES without replacement — key =
      ln(u)/w, take the n largest (Spark's sort-limit does partial top-k
      map-side).
    - ``replace=True``: n independent draws (reference `sample`'s default
      mode, `ext/RastersStatsBaseExt/sample.jl:29-93`); draw i picks the
      argmax over rows of ln(u(id·MIX + i))/w — ONE pass: rows cross-join
      the tiny draw range and a groupBy(draw) max-of-struct partial-
      aggregates map-side, so the shuffle carries n rows per partition,
      never the corpus. Output gains a ``draw`` column.
    - ``ordered=True``: result rows sorted by id (the reference's
      ``ordered`` keyword) instead of sample order.
    """
    if replace:
        other = [c for c in df.columns if c != id_col]
        draws = df.sparkSession.range(n).select(F.col("id").alias("draw"))
        key = F.log(u_col(F.col(id_col) * F.lit(DRAW_MIX) + F.col("draw"))) / F.col(weight_col)
        best = (
            df.crossJoin(F.broadcast(draws))
            .groupBy("draw")
            .agg(
                F.max(
                    F.struct(
                        key.alias("k"),
                        (-F.col(id_col)).alias("nid"),
                        *[F.col(c).alias(c) for c in other],
                    )
                ).alias("_m")
            )
        )
        out = best.select(
            "draw",
            (-F.col("_m.nid")).alias(id_col),
            *[F.col(f"_m.{c}").alias(c) for c in other],
        )
        return out.orderBy(id_col, "draw") if ordered else out
    key = F.log(u_col(F.col(id_col))) / F.col(weight_col)
    out = (
        df.withColumn("_samp_key", key)
        .orderBy(F.col("_samp_key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("_samp_key")
    )
    return out.orderBy(id_col) if ordered else out


# ---------------------------------------------------------------------------
# Deterministic dataset splits — the train/val/test primitive a training
# pipeline needs to be REPRODUCIBLE: the split must be a pure function of
# the row's stable id (never rand(), never row position), so re-sharding,
# re-partitioning, appends, and engine changes cannot move a document
# between splits. bucket = first 8 md5 hex digits of the id, mod 1000 —
# portable to any engine with md5.
# ---------------------------------------------------------------------------


def split_bucket_col(id_col) -> F.Column:
    """0..999 bucket from the stable id (md5-based, engine-portable)."""
    h = F.md5(id_col.cast("string"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000).cast("int")


def split_by_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    train_per_mille: int = 900,
    val_per_mille: int = 950,
) -> DataFrame:
    """Adds (bucket, split) with split ∈ train/val/test by per-mille
    thresholds. One projection — no shuffle, no state, no seed to lose."""
    b = split_bucket_col(F.col(id_col))
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_per_mille, F.lit("train"))
        .when(F.col("bucket") < val_per_mille, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain-mixture sampling: keep each row with its SOURCE's rate —
    the static data-mixing primitive (down-weight web crawl, keep
    curated sources whole). Acceptance compares an md5 per-mille bucket
    of the SALTED id (``id || ':mix'`` — a different variate from
    :func:`split_bucket_col`'s, so the keep/drop decision is independent
    of the train/val/test assignment; with the unsalted bucket every
    rate-0.9 survivor would land in a bucket<900 'train' split and val/
    test would hold zero mixture-sampled docs) to rate×1000: a pure
    filter, no shuffle, no seed to lose, and the SAME doc survives every
    run and every resharding. Rates > 1 are epoch-style upsampling and
    handled by :func:`mixture_sample_epochs`; this operator filters (a
    rate above 1 keeps every row once)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":mix")))
    b = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000
    rate = _mix_rate_col(rates, default_rate, source_col)
    return df.where(b.cast("double") < rate * 1000.0)


def _mix_rate_col(rates: dict[str, float], default_rate: float, source_col: str) -> F.Column:
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    return rate


def mixture_sample_epochs(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain-mixture sampling WITH upsampling: a source at rate R
    contributes floor(R) whole copies of every row plus one more with
    probability frac(R) — decided by the same ':mix'-salted md5 per-mille
    bucket as :func:`mixture_sample` (independent of the train/val/test
    variate), so a pretraining mix like {curated: 2.5, web: 0.3} is a
    pure deterministic projection: explode(sequence(0, n-1)) map-side,
    no shuffle, no seed, reshard-invariant. Output adds ``epoch``
    (0-based copy index) so the loader can phase copies across passes.
    R <= 1 degenerates to mixture_sample's filter with epoch = 0.

    Prefer exact binary-fraction rates (x/2^k, e.g. 2.5, 0.75): the
    fractional-part threshold frac*1000 then compares exactly in every
    engine."""
    rate = _mix_rate_col(rates, default_rate, source_col)
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":mix")))
    b = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000).cast("double")
    whole = F.floor(rate).cast("int")
    extra = (b < (rate - F.floor(rate)) * 1000.0).cast("int")
    n = whole + extra
    return (
        df.withColumn("_n_copies", n)
        .where(F.col("_n_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )
