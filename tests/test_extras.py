"""Extras: sinks round-trip, fractional resample, reproject, create."""

import pytest
from pyspark.sql import functions as F

from rasters_jl_spark.grid import GridSpec
from rasters_jl_spark.operators.extras import (
    create_raster,
    fractional_resample,
    reproject_grid,
)
from rasters_jl_spark.sources.raster_synth import RASTER_GRID, synth_raster
from rasters_jl_spark.sources.sinks import read_raster, write_raster


def test_write_read_roundtrip(spark, sf_dir, tmp_path):
    """write → read equality, the reference's per-backend IO round-trip
    tests (`test/sources/*.jl`)."""
    r = synth_raster(spark, sf_dir, "a")
    path = str(tmp_path / "rast")
    write_raster(r, path)
    back = read_raster(spark, path)
    orig = {(x["ix"], x["iy"]): x["value"] for x in r.collect()}
    got = {(x["ix"], x["iy"]): x["value"] for x in back.collect()}
    assert got == orig


def test_fractional_sums_to_one(spark, sf_dir):
    cat = synth_raster(spark, sf_dir, "a").select(
        "ix", "iy", (F.col("value").isNotNull().cast("int")).alias("value")
    )
    fr = fractional_resample(cat, 4)
    sums = fr.groupBy("ix", "iy").agg(F.round(F.sum("frac"), 6).alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in sums)


def test_reproject_is_metadata_only():
    g2 = reproject_grid(RASTER_GRID, "EPSG:3857", x_scale=111320.0, y_scale=111320.0)
    assert g2.nx == RASTER_GRID.nx and g2.crs == "EPSG:3857"
    assert g2.dx == pytest.approx(111320.0)
    # round-trip back
    g3 = reproject_grid(g2, "EPSG:4326", x_scale=1 / 111320.0, y_scale=1 / 111320.0)
    assert g3.x0 == pytest.approx(RASTER_GRID.x0)


def test_create_raster(spark):
    g = GridSpec(0.0, 0.0, 1.0, 1.0, 5, 4)
    r = create_raster(spark, g, fill=2.0)
    assert r.count() == 20
    assert r.where(F.col("value") == 2.0).count() == 20


def test_catalog_refs_and_fallback(spark, sf_dir, tmp_path):
    """Uniform table refs: parquet paths read/write; iceberg: refs error
    clearly when the runtime jar is absent (this sandbox has none)."""
    import pytest as _pytest

    from rasters_jl_spark.sources import catalog as cat

    assert not cat.is_iceberg_ref(f"{sf_dir}/documents.parquet")
    assert cat.is_iceberg_ref("iceberg:ice.db.pages")
    docs = cat.read_table(spark, f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "roundtrip")
    cat.write_table(docs.limit(7), out, mode="overwrite")
    assert cat.read_table(spark, out).count() == 7
    assert cat.current_snapshot_id(spark, out) is None
    if not cat.iceberg_available(spark):
        with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            cat.read_table(spark, "iceberg:ice.db.pages")
    with _pytest.raises(ValueError, match="snapshot_id"):
        cat.read_table(spark, out, snapshot_id=1)


def test_bucketed_rollup_has_no_exchange(spark, sf_dir, tmp_path):
    """A tile_id-bucketed table makes groupBy(tile_id) shuffle-free: the
    aggregate consumes the bucket partitioning (no Exchange in the plan)
    and matches the plain-scan rollup exactly."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from rasters_jl_spark.sources.pages import pages_geo
    from rasters_jl_spark.sources.sinks import write_pages_bucketed

    # warehouse.dir is a static conf — the table lands in the session's
    # default spark-warehouse and is dropped in the finally below
    pages = pages_geo(spark, sf_dir)
    write_pages_bucketed(pages.select("doc_id", "n_chars", "tile_id"), "pages_b", 16)
    try:
        rolled = (
            spark.table("pages_b")
            .groupBy("tile_id")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        )
        rolled.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rolled.explain()
        assert "Exchange" not in buf.getvalue()
        want = {
            (r["tile_id"], r["n"], r["s"])
            for r in pages.groupBy("tile_id")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
            .collect()
        }
        got = {(r["tile_id"], r["n"], r["s"]) for r in rolled.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_b")


def test_replace_missing_stack_roundtrip(spark, sf_dir):
    """Per-layer sentinel fill then normalise restores the original stack
    (reference NamedTuple replace_missing, src/methods/replace_missing.jl)."""
    from pyspark.sql import functions as F

    from rasters_jl_spark.sources.layers import layers_meta, replace_missing_stack
    from rasters_jl_spark.sources.raster_synth import synth_raster

    a = synth_raster(spark, sf_dir, "a").withColumn("layer", F.lit("a"))
    b = synth_raster(spark, sf_dir, "b").withColumn("layer", F.lit("b"))
    stack = a.unionByName(b).select("ix", "iy", "layer", "value")
    meta = layers_meta(spark, [("a", -9999.0, "double", ""), ("b", -1.0, "double", "")])
    filled = replace_missing_stack(stack, meta, to_null=False)
    # the fill actually materialised per-layer sentinels
    sentinels = {
        (r["layer"], r["value"])
        for r in filled.where(F.col("value").isin(-9999.0, -1.0)).select("layer", "value").distinct().collect()
    }
    assert sentinels == {("a", -9999.0), ("b", -1.0)}
    restored = replace_missing_stack(filled, meta, to_null=True)
    key = lambda df: {(r["ix"], r["iy"], r["layer"]): r["value"] for r in df.collect()}
    assert key(restored) == key(stack)


def test_layer_mods_scaled_roundtrip(spark):
    """Per-layer scale/offset read modifiers (reference ModifiedDiskArray,
    src/modifieddiskarray.jl: _applymod read / _invertmod write; `scaled`
    keyword src/array.jl:374-384): DN → physical applies sentinel-→NULL
    BEFORE the gain (missingval is tested on raw values), physical →
    DN inverts exactly with integer coercion, raw=True ignores both, and
    scaled=False keeps sentinel normalisation but skips the gain —
    mirroring the reference's scaled-GeoTIFF read cases
    (test/sources/gdal.jl scaled reads)."""
    from pyspark.sql import functions as F

    from rasters_jl_spark.sources.layers import (
        apply_layer_mods,
        invert_layer_mods,
        layers_meta,
    )

    dn_rows = [
        # (ix, iy, layer, DN): layer a int16 DNs with mv -9999; layer f
        # is a float layer (no coercion) with offset only
        (0, 0, "a", 100.0), (1, 0, "a", -9999.0), (2, 0, "a", -40.0),
        (0, 0, "f", 1.5), (1, 0, "f", -2.25),
        (0, 1, "x", 7.0),  # layer absent from the catalog: passthrough
    ]
    dn = spark.createDataFrame(dn_rows, "ix int, iy int, layer string, value double")
    meta = layers_meta(
        spark,
        [
            ("a", -9999.0, "int16", "K", 0.02, 273.15),
            ("f", None, "float64", "m", None, 10.0),
        ],
    )

    key = lambda df: {(r["ix"], r["iy"], r["layer"]): r["value"] for r in df.collect()}

    phys = key(apply_layer_mods(dn, meta))
    assert phys[(0, 0, "a")] == 100.0 * 0.02 + 273.15
    assert phys[(1, 0, "a")] is None          # sentinel tested on RAW value
    assert phys[(2, 0, "a")] == -40.0 * 0.02 + 273.15
    assert phys[(0, 0, "f")] == 1.5 + 10.0    # NULL scale = multiply-by-nothing
    assert phys[(1, 0, "f")] == -2.25 + 10.0
    assert phys[(0, 1, "x")] == 7.0           # uncataloged layer unchanged

    # write path inverts exactly (gain chosen binary-representable-free on
    # purpose: coercion rounds back to the stored integer DN)
    back = key(invert_layer_mods(apply_layer_mods(dn, meta), meta))
    assert back == key(dn)

    # raw=True: bytes exactly as stored, sentinel and gain both ignored
    assert key(apply_layer_mods(dn, meta, raw=True)) == key(dn)

    # scaled=False: sentinel normalisation only
    unscaled = key(apply_layer_mods(dn, meta, scaled=False))
    assert unscaled[(1, 0, "a")] is None and unscaled[(0, 0, "a")] == 100.0

    # trunc coercion truncates toward zero on integer layers only
    tr = key(
        invert_layer_mods(
            apply_layer_mods(dn, meta).withColumn(
                "value", F.col("value") + F.when(F.col("layer") == "a", 0.0196).otherwise(0.0)
            ),
            meta,
            coerce="trunc",
        )
    )
    assert tr[(0, 0, "a")] == 100.0 and tr[(0, 0, "f")] == 1.5


def test_sessionize_gap_boundaries(spark):
    """Gap-based sessions: a gap strictly over the threshold starts a new
    session; an exact-threshold gap does not; sessions are per-user."""
    import datetime as dt

    from rasters_jl_spark.operators.extras import session_stats, sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, user, minutes, val=1.0):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, "click", val, "{}")

    events = spark.createDataFrame(
        [
            ev(0, 1, 0), ev(1, 1, 10), ev(2, 1, 40),   # 30-min gap exactly -> same session
            ev(3, 1, 80),                               # 40-min gap -> new session
            ev(4, 2, 0),                                # other user independent
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    s = {r["event_id"]: r["session_id"] for r in sessionize(events).collect()}
    assert s == {0: 1, 1: 1, 2: 1, 3: 2, 4: 1}
    stats = {(r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
             for r in session_stats(events).collect()}
    assert stats[(1, 1)] == (3, 2400)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 1)] == (1, 0)


def test_series_from_files_at_selection_prunes_files(spark, tmp_path):
    """The reference's series[At(date)] over a filename-dated file list
    (src/series.jl:53-92, date parsing :76-92): flat date-named parquet
    files re-assemble with Ti parsed from the path; at= becomes a
    pathGlobFilter so ONLY the matching file is listed/opened (real file
    skip, checked via inputFiles), and the parsed Ti matches the data."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from rasters_jl_spark.operators.extras import series_from_files

    days = ["2026-01-01", "2026-01-02", "2026-01-03"]
    for i, d in enumerate(days):
        pq.write_table(
            pa.table({"cell": [1, 2], "value": [float(i), float(i) + 0.5]}),
            tmp_path / f"raster_{d}.parquet",
        )

    full = series_from_files(spark, str(tmp_path))
    rows = full.groupBy("Ti").agg(F.sum("value").alias("s")).collect()
    got = {str(r["Ti"]): r["s"] for r in rows}
    assert got == {d: 2 * i + 0.5 for i, d in enumerate(days)}

    one = series_from_files(spark, str(tmp_path), at="2026-01-02")
    files = one.inputFiles()
    assert len(files) == 1 and "raster_2026-01-02.parquet" in files[0]
    vals = one.select("Ti", "value").collect()
    assert {str(r["Ti"]) for r in vals} == {"2026-01-02"}
    assert sorted(r["value"] for r in vals) == [1.0, 1.5]
