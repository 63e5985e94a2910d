"""WARC/WET container source: real on-disk files through the binaryFile
scan, both layouts, error routing, bounded inflate."""

import zlib

import pytest

from rasters_jl_spark.sources.warc import (
    build_warc,
    gzip_members,
    iter_warc_records,
    parse_warc,
    read_warc,
    synth_warc,
)

RECS = [
    ("conversion", "https://crawl.example/doc/0", "first record text"),
    ("conversion", "https://crawl.example/doc/1", "second, with unicode: éß"),
    ("response", "https://crawl.example/doc/2", ""),
]


def test_read_warc_real_files_both_layouts(spark, tmp_path):
    """Plain .wet and gzip-member .warc.gz files written to disk come back
    record-identical through spark.read.format('binaryFile')."""
    plain = build_warc(RECS)
    (tmp_path / "a.wet").write_bytes(plain)
    (tmp_path / "b.warc.gz").write_bytes(gzip_members(plain))
    out = read_warc(spark, str(tmp_path) + "/*").collect()
    assert len(out) == 6
    by_file = {}
    for r in out:
        by_file.setdefault(r["file_id"].rsplit("/", 1)[-1], []).append(r)
    for fname in ("a.wet", "b.warc.gz"):
        rows = sorted(by_file[fname], key=lambda r: r["rec_idx"])
        assert [r["rec_type"] for r in rows] == ["conversion", "conversion", "response"]
        assert [r["text"] for r in rows] == [t for _, _, t in RECS]
        assert [r["content_length"] for r in rows] == [
            len(t.encode("utf-8")) for _, _, t in RECS
        ]
        assert rows[1]["target_uri"] == "https://crawl.example/doc/1"


def test_parse_warc_routes_corrupt_file_per_row(spark):
    """A file with a corrupt record yields rec_type='error' for that file;
    healthy files in the same batch still parse."""
    good = build_warc(RECS[:1])
    bad = good[: len(good) // 2]  # truncated mid-record
    files = spark.createDataFrame(
        [("good", bytearray(good)), ("bad", bytearray(bad))],
        "file_id string, payload binary",
    )
    rows = {r["file_id"]: r for r in parse_warc(files).collect()}
    assert rows["good"]["rec_type"] == "conversion"
    assert rows["bad"]["rec_type"] == "error" and rows["bad"]["rec_idx"] == -1
    assert rows["bad"]["text"] is None


def test_iter_warc_lf_only_headers():
    """Bare-LF headers (sloppy writers) are tolerated."""
    body = b"hello"
    rec = (
        b"WARC/1.0\nWARC-Type: conversion\nContent-Length: 5\n\n" + body + b"\n\n"
    )
    [(hdrs, content)] = list(iter_warc_records(rec))
    assert hdrs["warc-type"] == "conversion" and content == body


def test_iter_warc_mixed_terminators_and_linear_scan():
    """A conformant CRLF container whose record CONTENT embeds '\\n\\n' and
    '\\r\\n\\r\\n' (HTTP response payloads do) still splits on Content-Length,
    a sloppy LF-only record can follow a CRLF record in the same container,
    and the plain-container split touches each payload byte O(1) times —
    the bounded LF2 probe must not re-scan the shard tail per record (the
    old unbounded find made 1 GB shards quadratic)."""
    http_body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>\n\nhi</p>"
    crlf = build_warc([("response", "https://e/0", http_body)])
    lf_rec = b"WARC/1.0\nWARC-Type: conversion\nContent-Length: 2\n\nok\n\n"
    out = list(iter_warc_records(crlf + lf_rec))
    assert [c for _, c in out] == [http_body.encode(), b"ok"]

    # linearity: records × per-record find cost must not scale with the
    # container size. 2,000 CRLF records with fat tails would cost ~2e9
    # byte-touches quadratically; assert wall time stays in the linear range.
    import time

    big = build_warc(
        [("conversion", f"https://e/{i}", "z" * 2_000) for i in range(2_000)]
    )
    t0 = time.perf_counter()
    assert len(list(iter_warc_records(big))) == 2_000
    assert time.perf_counter() - t0 < 2.0  # quadratic scan ≈ tens of seconds


def test_gzip_member_bomb_is_bounded():
    """A tiny member inflating past max_member_bytes raises ValueError
    (routing contract), not MemoryError."""
    rec = build_warc([("conversion", "u", "x" * 100_000)])
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    member = co.compress(rec) + co.flush()
    with pytest.raises(ValueError, match="max_member_bytes"):
        list(iter_warc_records(member, max_member_bytes=1024))


def test_synth_warc_layout_mix(spark, sf_dir):
    """The fixture emits 6 shards for 48 docs at per_file=8, even shards
    gzip members, odd shards plain."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = {r["file_id"]: bytes(r["payload"]) for r in synth_warc(docs).collect()}
    assert sorted(files) == [f"shard-{i:05d}" for i in range(6)]
    for i in range(6):
        payload = files[f"shard-{i:05d}"]
        is_gz = payload[:2] == b"\x1f\x8b"
        assert is_gz == (i % 2 == 0)
        assert len(list(iter_warc_records(payload))) == 8


def test_write_warc_roundtrip_byte_identity(spark, sf_dir, tmp_path):
    """The sink is the exact inverse of the parser: records parsed from the
    synth shards and re-written with the same grouping produce BYTE-
    identical containers (fixed WARC-Date, zeroed gzip mtime, explicit
    in-shard sort), for both the plain and gzip-member layouts; read_warc
    over the sink output recovers the records field-identical."""
    from pyspark.sql import functions as F

    from rasters_jl_spark.sources.warc import (
        parse_warc,
        read_warc,
        synth_warc,
        write_warc,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = synth_warc(docs)
    originals = {r["file_id"]: bytes(r["payload"]) for r in files.collect()}
    recs = parse_warc(files).withColumn(
        "shard_n", F.regexp_extract("file_id", r"shard-(\d+)", 1).cast("int")
    )

    plain_dir, gz_dir = str(tmp_path / "plain"), str(tmp_path / "gz")
    m_plain = {
        r["file_id"]: r
        for r in write_warc(
            recs.where(F.col("shard_n") % 2 == 1), plain_dir
        ).collect()
    }
    m_gz = {
        r["file_id"]: r
        for r in write_warc(
            recs.where(F.col("shard_n") % 2 == 0), gz_dir, gzip=True
        ).collect()
    }
    assert len(m_plain) == 3 and len(m_gz) == 3
    for fid, man in {**m_plain, **m_gz}.items():
        with open(man["path"], "rb") as f:
            data = f.read()
        assert data == originals[fid], fid
        assert man["n_bytes"] == len(originals[fid]) and man["n_records"] == 8

    back = read_warc(spark, plain_dir + "/*").collect()
    orig = recs.where(F.col("shard_n") % 2 == 1).collect()
    key = lambda rows: sorted(
        (r["rec_idx"], r["rec_type"], r["target_uri"], r["content_length"], r["text"])
        for r in rows
    )
    assert key(back) == key(orig)
