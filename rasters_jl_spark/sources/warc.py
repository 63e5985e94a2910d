"""WARC / WET crawl-container ingest (ISO 28500; the Common Crawl layout).

The reference ingests whole files per source and iterates records inside
them (`/root/reference/src/sources/sources.jl` one-handle-per-source model);
the Spark-first shape for a record container that is NOT byte-splittable is
**file-level parallelism**: `spark.read.format("binaryFile")` yields one row
per `.warc(.gz)` file, one task per file, and the record split runs inside
an Arrow `mapInPandas` kernel. That is exactly how the published crawl
pipelines (CCNet §2, C4) schedule Common Crawl — a WET shard is the unit of
work; 100 TB = ~1M shards = ~1M tasks, embarrassingly parallel, no shuffle
until the records are rows.

Two container layouts, auto-detected per file:

- **plain** `.warc` / `.wet`: records concatenated, each
  ``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``.
- **gzip members** `.warc.gz` / `.wet.gz` (the Common Crawl on-disk form):
  each record is its own gzip member, members concatenated; split by
  repeatedly inflating with ``zlib.decompressobj(wbits=31)`` and following
  ``unused_data``. Member inflation is BOUNDED (``max_member_bytes``) so a
  decompression bomb fails the row's ValueError routing contract instead of
  exhausting executor memory (same contract as the image decoders).

Malformed records degrade PER ROW (``rec_type='error'`` with NULL fields) —
one corrupt record in a 1 GB shard must not kill the task. WET files are
WARC files whose records are ``WARC-Type: conversion`` text extracts; the
same parser covers both.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = b"\r\n\r\n"
_LF2 = b"\n\n"

#: Per-record inflate cap: a gzip member claiming to expand past this raises
#: the routing ValueError (web-crawl records are ~MBs; 256 MiB is generous).
MAX_MEMBER_BYTES = 256 * 1024 * 1024

WARC_RECORD_SCHEMA = (
    "file_id string, rec_idx int, rec_type string, target_uri string, "
    "content_length bigint, text string"
)


def _split_gzip_members(payload: bytes, max_member_bytes: int) -> list[bytes]:
    """Concatenated gzip members → list of inflated member bytes."""
    out, rest = [], payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(rest, max_member_bytes + 1)
        except zlib.error as e:  # foreign type must not leak past the contract
            raise ValueError(f"malformed gzip member ({e})") from e
        if len(member) > max_member_bytes:
            raise ValueError("gzip member exceeds max_member_bytes")
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(member)
        rest = d.unused_data
    return out


def _parse_record(chunk: bytes, offset: int) -> tuple[dict, bytes, int]:
    """One WARC record at ``offset``: (headers, content, next_offset).

    Header lines are CRLF per ISO 28500 §4 but bare-LF output from sloppy
    writers is tolerated (keys/values are stripped)."""
    end = chunk.find(_CRLF2, offset)
    sep = len(_CRLF2)
    # Sloppy bare-LF writers are tolerated, but a conformant CRLF container
    # must not pay an O(rest-of-shard) LF2 scan per record (\n\n never occurs
    # in spec output, so an unbounded find would touch every later byte once
    # per record — O(n²) over a 1 GB shard). Bound the LF2 probe by the CRLF2
    # hit: an earlier \n\n means the header region itself is LF-terminated.
    # Only when CRLF2 is absent entirely does the probe scan the tail.
    lf_end = chunk.find(_LF2, offset, end if end != -1 else len(chunk))
    if end == -1 or (lf_end != -1 and lf_end < end):
        end, sep = lf_end, len(_LF2)
    if end == -1:
        raise ValueError("malformed WARC record: no header terminator")
    head = chunk[offset:end].decode("utf-8", errors="replace")
    lines = head.replace("\r\n", "\n").split("\n")
    if not lines or not lines[0].startswith("WARC/"):
        raise ValueError("malformed WARC record: missing version line")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" not in ln:
            raise ValueError(f"malformed WARC header line: {ln!r}")
        k, v = ln.split(":", 1)
        headers[k.strip().lower()] = v.strip()
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError) as e:
        raise ValueError("malformed WARC record: bad Content-Length") from e
    if clen < 0 or end + sep + clen > len(chunk):
        raise ValueError("malformed WARC record: content overruns container")
    content = chunk[end + sep : end + sep + clen]
    nxt = end + sep + clen
    # consume the two record-terminating newlines (either convention)
    for term in (_CRLF2, b"\r\n", _LF2, b"\n"):
        if chunk.startswith(term, nxt):
            nxt += len(term)
            break
    return headers, content, nxt


def iter_warc_records(
    payload: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, content) per record from a plain or gzip-member
    container. Raises ValueError on container-level corruption; record
    iteration is strict (callers route per record via :func:`parse_warc`)."""
    if payload[:2] == b"\x1f\x8b":
        for member in _split_gzip_members(payload, max_member_bytes):
            headers, content, nxt = _parse_record(member, 0)
            if member[nxt:].strip(b"\r\n"):
                raise ValueError("gzip member holds more than one record")
            yield headers, content
        return
    offset, n = 0, len(payload)
    while offset < n:
        # skip newline padding byte-by-byte — never payload[offset:].strip(),
        # which copies the remaining tail once per record
        while offset < n and payload[offset] in (0x0D, 0x0A):
            offset += 1
        if offset >= n:
            return  # trailing newline padding
        headers, content, offset = _parse_record(payload, offset)
        yield headers, content


def parse_warc(
    files: DataFrame,
    id_col: str = "file_id",
    payload_col: str = "payload",
    max_member_bytes: int = MAX_MEMBER_BYTES,
) -> DataFrame:
    """(file_id, rec_idx, rec_type, target_uri, content_length, text): split
    every container payload into WARC records. One Arrow batch per file row —
    parallelism is the file count (see module docstring); inside a file the
    split is a sequential scan, exactly the container's own structure.

    Error routing: a record that fails to parse yields ``rec_type='error'``
    with NULL fields and parsing of that FILE stops (offsets past a corrupt
    Content-Length are untrustworthy); other files in the batch continue."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "file_id", "rec_idx", "rec_type", "target_uri",
                "content_length", "text",
            )}
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                fid = str(fid)
                try:
                    for i, (hdrs, content) in enumerate(
                        iter_warc_records(bytes(payload), max_member_bytes)
                    ):
                        rows["file_id"].append(fid)
                        rows["rec_idx"].append(i)
                        rows["rec_type"].append(hdrs.get("warc-type"))
                        rows["target_uri"].append(hdrs.get("warc-target-uri"))
                        rows["content_length"].append(len(content))
                        rows["text"].append(content.decode("utf-8", errors="replace"))
                except ValueError:
                    rows["file_id"].append(fid)
                    rows["rec_idx"].append(-1)
                    rows["rec_type"].append("error")
                    for k in ("target_uri", "content_length", "text"):
                        rows[k].append(None)
            yield pd.DataFrame(rows, dtype=object)

    return files.mapInPandas(_batches, WARC_RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Scan a directory/glob of ``.warc``/``.wet``(.gz) files into records:
    ``binaryFile`` source (one row + one task per file; Catalyst prunes on
    path/length/modificationTime) → :func:`parse_warc`."""
    files = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("file_id"), F.col("content").alias("payload")
    )
    return parse_warc(files, **kwargs)


WARC_MANIFEST_SCHEMA = "file_id string, path string, n_records int, n_bytes bigint"


def write_warc(
    records: DataFrame,
    out_dir: str,
    shard_col: str = "file_id",
    order_cols: tuple = ("rec_idx",),
    gzip: bool = False,
) -> DataFrame:
    """Re-shard crawl records back into WARC containers — the sink twin of
    :func:`parse_warc`. Real crawl pipelines re-shard (merge small shards,
    split hot ones, re-partition by domain) and the unit of work is the
    same as ingest: ONE grouped task builds and writes ONE container file
    (``<out_dir>/<shard>.warc`` or ``.warc.gz``), executor-side — file-
    level parallelism with no driver funnel, the write-side mirror of the
    reference's one-handle-per-source model (`src/sources/sources.jl`).

    Deterministic bytes: fixed WARC-Date, zeroed gzip MTIME, and an
    explicit in-shard sort on ``order_cols`` (container order is a real
    contract — record offsets are addresses downstream). Records need
    (rec_type, target_uri, text) plus the shard/order columns. Returns
    the manifest (file_id, path, n_records, n_bytes) — the bounded
    DataFrame a catalog ingests; the payload bytes never move through a
    shuffle or the driver."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip else ".warc"

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols))
        fid = str(pdf[shard_col].iloc[0])
        recs = [
            (str(t), str(u), str(x) if x is not None else "")
            for t, u, x in zip(pdf["rec_type"], pdf["target_uri"], pdf["text"])
        ]
        container = build_warc(recs)
        if gzip:
            container = gzip_members(container)
        path = os.path.join(out_dir, fid + ext)
        with open(path, "wb") as f:
            f.write(container)
        return pd.DataFrame(
            {
                "file_id": [fid],
                "path": [path],
                "n_records": [len(recs)],
                "n_bytes": [len(container)],
            }
        )

    return records.groupBy(shard_col).applyInPandas(_write, WARC_MANIFEST_SCHEMA)


# ------------------------------------------------------------ fixtures
_WARC_DATE = "2026-01-01T00:00:00Z"


def build_warc(records: list[tuple[str, str, str]]) -> bytes:
    """Assemble a plain WARC container from (rec_type, uri, text) triples —
    deterministic (fixed WARC-Date, no uuids)."""
    out = []
    for rec_type, uri, text in records:
        body = text.encode("utf-8")
        out.append(
            (
                "WARC/1.0\r\n"
                f"WARC-Type: {rec_type}\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"WARC-Date: {_WARC_DATE}\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii")
            + body
            + b"\r\n\r\n"
        )
    return b"".join(out)


def gzip_members(container: bytes) -> bytes:
    """Re-pack a plain container as one gzip member PER RECORD (the
    Common Crawl `.warc.gz` layout) — stdlib zlib, fixed mtime=0 header so
    the fixture is byte-deterministic."""
    out = []
    offset = 0
    while offset < len(container):
        if not container[offset:].strip(b"\r\n"):
            break
        _, _, nxt = _parse_record(container, offset)
        rec = container[offset:nxt]
        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        member = co.compress(rec) + co.flush()
        # zero the gzip MTIME field (bytes 4:8) for determinism
        out.append(member[:4] + b"\x00\x00\x00\x00" + member[8:])
        offset = nxt
    return b"".join(out)


def synth_warc(
    docs: DataFrame, per_file: int = 8, limit: int = 48, gzip_every: int = 2
) -> DataFrame:
    """Deterministic crawl-container fixture: the first ``limit`` documents
    packed ``per_file`` records to a container (``WARC-Type: conversion``,
    the WET shape), every ``gzip_every``-th file stored as gzip members so
    one query exercises both layouts. Returns (file_id string, payload
    binary). Grouped ``applyInPandas`` — same per-file build a real
    crawler's writer does."""
    base = (
        docs.select(
            "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
        )
        .orderBy("doc_id")
        .limit(limit)
        .withColumn("file_id", (F.col("doc_id") / per_file).cast("long"))
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        recs = [
            ("conversion", f"https://crawl.example/doc/{int(d)}", str(t))
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        container = build_warc(recs)
        if fid % gzip_every == 0:
            container = gzip_members(container)
        return pd.DataFrame({"file_id": [f"shard-{fid:05d}"], "payload": [container]})

    return base.groupBy("file_id").applyInPandas(
        _build, "file_id string, payload binary"
    )
