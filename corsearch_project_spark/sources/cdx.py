"""CDX capture index over WARC archives — the web-archive lookup layer.

Common Crawl, the Internet Archive's Wayback Machine, and every pywb-style
replay system answer "give me the captures of <url>/<domain>" through a CDX
index: one row per archived record carrying the SURT-transformed url (the
sort key), the capture timestamp, the payload digest, and — crucially —
the (filename, offset, length) of the gzip member holding the record, so a
reader fetches ONE ranged GET instead of scanning archives. This module
builds that index with Spark and serves prefix lookups from it:

- :func:`read_warc_index` — the splittable WARC range scan (same manifest
  + task-side resync machinery as ``warc.read_warc_ranges``) extended to
  surface each record's byte extent: for per-record-gzip archives (the CC
  layout) ``(offset, length)`` delimit exactly one gzip member; for plain
  WARCs they delimit the record's header+block bytes. The digest is
  sha256 of the decoded HTTP payload (what CDXJ calls ``digest``).
- :func:`write_cdx` — range-partition by ``surt`` and sort within
  partitions, so (a) every registrable domain is contiguous in one (or
  few) files and (b) parquet min/max stats on the sorted ``surt`` column
  prune both files and row groups for prefix probes. At 10^12 captures
  this is the difference between a point lookup touching kilobytes and
  touching the whole index.
- :func:`cdx_lookup` — prefix probe compiled to a pushed-down
  ``StringStartsWith`` parquet filter (verified by plan gate in
  ``tests/test_cdx.py``).

A gzip member that holds several records (non-CC framing) indexes all of
them at the member's extent — the reader inflates the member and scans
within, exactly how pywb treats such archives.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import os
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from corsearch_project_spark.sources.warc import (
    CRLF2,
    _SplitReader,
    _http_body,
    _iter_warc_plain,
    _parse_headers,
    _parse_warc_date,
    _read_gzip_member,
    _sync_gzip_member,
    warc_manifest,
)

# url, ts, digest (payload sha256), filename, offset, length
_IndexRec = Tuple[str, Optional[_dt.datetime], str, str, int, int]

CDX_SCHEMA = (
    "surt string, url string, warc_ts timestamp, digest string, "
    "filename string, offset bigint, length bigint"
)
_SCAN_SCHEMA = (
    "url string, warc_ts timestamp, digest string, "
    "filename string, offset bigint, length bigint"
)


def _gzip_indexed_records(
    r: _SplitReader, end: int, fname: str
) -> Iterator[_IndexRec]:
    """Per-record-gzip scan yielding each record with its MEMBER extent:
    offset = absolute file offset of the member's gzip magic, length =
    compressed member bytes — a ranged read of [offset, offset+length)
    plus one inflate reproduces the record, no index-free scan needed."""
    if not _sync_gzip_member(r, end):
        return
    while r.pos < end:
        start = r.pos
        member = _read_gzip_member(r)
        if member is None:  # corrupt member: skip its magic, resync
            r.consume(min(3, len(r.buf)))
            if not _sync_gzip_member(r, end):
                return
            continue
        comp_len = r.pos - start
        for url, ts, body in _iter_warc_plain(member):
            yield (
                url, ts, hashlib.sha256(body).hexdigest(),
                fname, start, comp_len,
            )
        if not r.ensure(3) or not r.buf.startswith(b"\x1f\x8b\x08"):
            return


def _plain_indexed_records(
    r: _SplitReader, end: int, fname: str
) -> Iterator[_IndexRec]:
    """Uncompressed-WARC twin: offset = absolute offset of the record's
    ``WARC/`` version line, length = header block + CRLF CRLF + content
    block. Same resync-then-stream shape as ``_plain_split_records``."""
    synced = False
    while r.pos < end and not synced:
        i = r.buf.find(b"WARC/1.")
        if i < 0:
            keep = 8
            if len(r.buf) > keep:
                r.consume(len(r.buf) - keep)
            if not r.ensure(len(r.buf) + 1):
                return
            continue
        if r.pos + i >= end:
            return
        r.ensure(i + 65536)
        hdr_end = r.buf.find(CRLF2, i)
        headers = (
            _parse_headers(bytes(r.buf[i:hdr_end])) if hdr_end >= 0 else {}
        )
        if "content-length" in headers and "warc-type" in headers:
            r.consume(i)
            synced = True
        else:
            r.consume(i + 1)
    if not synced:
        return
    while r.pos < end:
        hdr_end = r.buf.find(CRLF2)
        while hdr_end < 0 and len(r.buf) < (1 << 20):
            if not r.ensure(len(r.buf) + 1):
                return
            hdr_end = r.buf.find(CRLF2)
        if hdr_end < 0:
            return
        headers = _parse_headers(bytes(r.buf[:hdr_end]))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            r.consume(hdr_end + 4)
            continue
        if not r.ensure(hdr_end + 4 + length):
            return
        start = r.pos
        rec_len = hdr_end + 4 + length
        block = bytes(r.buf[hdr_end + 4 : hdr_end + 4 + length])
        r.consume(rec_len)
        if r.buf[:4] == CRLF2:
            r.consume(4)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        yield (
            url,
            _parse_warc_date(headers.get("warc-date", "")),
            hashlib.sha256(_http_body(block)).hexdigest(),
            fname, start, rec_len,
        )


def read_warc_index(spark, path: str, split_bytes: int = 64 << 20) -> DataFrame:
    """Index scan over a WARC file/glob/dir: one task per (file, offset,
    length) manifest range (size-only metadata, nothing read on the
    driver), each task resyncing to a record/member boundary and streaming
    bounded Arrow batches of index rows. The ``surt`` sort key is added
    JVM-side (``urlnorm.surt_key`` — codegen, not Python), so the single
    Python stage does only byte scanning + sha256.
    """
    import pyarrow as pa

    from corsearch_project_spark.functions.urlnorm import surt_key

    manifest = warc_manifest(path, split_bytes)
    if not manifest:
        raise FileNotFoundError(f"no WARC files under {path!r}")
    mdf = spark.createDataFrame(
        manifest, "path string, offset bigint, length bigint"
    ).repartition(len(manifest))

    def expand(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            for row in rb.to_pylist():
                fpath, offset, length = row["path"], row["offset"], row["length"]
                fname = os.path.basename(fpath)
                with open(fpath, "rb") as probe:
                    is_gz = probe.read(2) == b"\x1f\x8b"
                with open(fpath, "rb") as fobj:
                    fobj.seek(offset)
                    r = _SplitReader(fobj, offset)
                    records = (
                        _gzip_indexed_records(r, offset + length, fname)
                        if is_gz
                        else _plain_indexed_records(r, offset + length, fname)
                    )
                    rows, nbytes = [], 0
                    for rec in records:
                        rows.append(rec)
                        nbytes += len(rec[0]) + 200
                        if len(rows) >= 4096 or nbytes >= (8 << 20):
                            yield _to_batch(rows)
                            rows, nbytes = [], 0
                    if rows:
                        yield _to_batch(rows)

    raw = mdf.mapInArrow(expand, schema=_SCAN_SCHEMA)
    return raw.select(
        surt_key(F.col("url")).alias("surt"),
        "url", "warc_ts", "digest", "filename", "offset", "length",
    )


def _to_batch(rows):
    import pyarrow as pa

    urls, tss, digs, fns, offs, lens = zip(*rows)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(digs, pa.string()),
            pa.array(fns, pa.string()),
            pa.array(offs, pa.int64()),
            pa.array(lens, pa.int64()),
        ],
        names=["url", "warc_ts", "digest", "filename", "offset", "length"],
    )


def write_cdx(index: DataFrame, path: str, partitions: int = 0) -> None:
    """Materialize the index range-partitioned + sorted by (surt, warc_ts).

    ``repartitionByRange`` samples the surt distribution, so each output
    file owns one contiguous key range — a registrable domain lands in one
    (or few) files, and because rows are sorted within files, parquet
    min/max column stats prune at BOTH file and row-group granularity for
    any surt-prefix probe. The index for 10^12 captures is itself big
    (~10^12 rows), which is why it must be a partition-pruned table, not a
    driver-side structure."""
    n = partitions or max(1, index.sparkSession.sparkContext.defaultParallelism)
    (
        index.repartitionByRange(n, "surt")
        .sortWithinPartitions("surt", "warc_ts")
        .write.mode("overwrite")
        .parquet(path)
    )


def cdx_lookup(spark, index_path: str, surt_prefix: str) -> DataFrame:
    """All captures whose surt starts with ``surt_prefix`` (a domain probe
    uses ``"com,example"`` — reversed-host ordering makes every subdomain
    share the prefix). ``startswith`` compiles to a ``StringStartsWith``
    pushed parquet filter, which the sorted layout answers from min/max
    stats without reading non-matching row groups."""
    idx = spark.read.parquet(index_path)
    return idx.where(F.col("surt").startswith(surt_prefix))
