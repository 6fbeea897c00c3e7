"""WET export/import — Common-Crawl-style plain-text conversion records.

The extraction pipeline's natural interchange output is WET: one WARC/1.0
``conversion`` record per document carrying the extracted text, the
counterpart of the WARC ``response`` records the crawl side ingests
(``sources/warc.py``). Emitting WET closes the loop — WARC in, extracted
table, WET out — and makes the engine's output consumable by every tool
that already reads Common Crawl.

Write shape (10^12 docs): one ``.warc.wet.gz`` file per partition, written
task-side through plain ``open()`` (the same filesystem seam as
``read_warc_ranges`` — a cluster swaps in an fsspec/S3 opener), each
record its OWN gzip member (the Common Crawl convention, and exactly what
makes the output splittable again by ``read_warc_ranges``'s member-resync
scan). Task retries are idempotent: records stream to
``part-N.inprogress`` and an atomic ``os.replace`` publishes the final
name, so a re-executed task overwrites its own partition, never doubles
it. Peak task memory is one record, not one partition. The writer runs
inside ``mapInArrow`` and emits one manifest row per partition
(file, n_records, n_bytes) — the caller materializes that relation
(bounded: one row per partition), making the write a plan-visible,
resumable step rather than a foreach side effect.

Record-ID determinism: ``WARC-Record-ID`` is a urn:sha256 of
(url, timestamp) — re-exports of the same snapshot are byte-identical,
so WET files participate in the repo's digest-based lineage checks.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import os
from typing import Iterator, Optional, Tuple

CRLF = b"\r\n"


def _warc_date(ts: Optional[_dt.datetime]) -> str:
    if ts is None:
        ts = _dt.datetime(1970, 1, 1)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def wet_record_bytes(url: str, ts: Optional[_dt.datetime], text: str) -> bytes:
    """One WARC/1.0 conversion record (uncompressed bytes)."""
    payload = (text or "").encode("utf-8")
    rid = hashlib.sha256(
        (url + "\x00" + _warc_date(ts)).encode("utf-8")
    ).hexdigest()
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: conversion" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + _warc_date(ts).encode("ascii") + CRLF
        + b"WARC-Record-ID: <urn:sha256:" + rid.encode("ascii") + b">" + CRLF
        + b"Content-Type: text/plain" + CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + CRLF
    )
    return headers + CRLF + payload + CRLF + CRLF


def write_records(df, out_dir: str, prefix: str, suffix: str, cols, record_fn):
    """Generic per-partition WARC-family record writer: ``df`` projected
    to ``cols``, each row turned into record bytes by ``record_fn(*vals)``
    and written as its own gzip member (splittable again by the member-
    resync range scan). Shared by WET (``write_wet``) and WAT
    (``sources/wat.py``) exports — identical idempotence (``.inprogress``
    -> ``os.replace``), determinism (mtime 0), and manifest contract.

    Returns the manifest DataFrame (file, n_records, n_bytes), one row
    per non-empty partition. The write happens when the manifest is
    materialized — count() or collect() it to execute (and keep it: it IS
    the export's lineage record).
    """
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema(
        [
            pa.field("file", pa.string()),
            pa.field("n_records", pa.int64()),
            pa.field("n_bytes", pa.int64()),
        ]
    )

    def write_partition(
        batches: Iterator["pa.RecordBatch"],
    ) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"{prefix}-{pid:05d}{suffix}")
        tmp = final + ".inprogress"
        n = 0
        with open(tmp, "wb") as out:
            for rb in batches:
                arrays = [rb.column(rb.schema.names.index(c)) for c in cols]
                for vals in zip(*arrays):
                    rec = record_fn(*[v.as_py() for v in vals])
                    # One gzip member per record: mtime pinned to 0 so the
                    # output is byte-deterministic across export reruns.
                    out.write(gzip.compress(rec, mtime=0))
                    n += 1
        if n == 0:
            os.remove(tmp)
            return
        size = os.path.getsize(tmp)
        os.replace(tmp, final)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([final], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([size], pa.int64()),
            ],
            schema=schema,
        )

    return df.select(*cols).mapInArrow(
        write_partition, "file string, n_records long, n_bytes long"
    )


def write_wet(df, out_dir: str, prefix: str = "part"):
    """Extracted rows (url, warc_ts, text) -> per-partition WET files.
    See ``write_records`` for the manifest/idempotence contract."""
    return write_records(
        df,
        out_dir,
        prefix,
        ".warc.wet.gz",
        ("url", "warc_ts", "text"),
        lambda u, ts, tx: wet_record_bytes(u or "", ts, tx or ""),
    )


def _iter_wet_plain(
    buf: bytes,
    rec_type: str = "conversion",
) -> Iterator[Tuple[str, Optional[_dt.datetime], str]]:
    from corsearch_project_spark.sources.warc import (
        _parse_headers,
        _parse_warc_date,
    )

    i = 0
    while i < len(buf):
        start = buf.find(b"WARC/", i)
        if start < 0:
            break
        hdr_end = buf.find(CRLF + CRLF, start)
        if hdr_end < 0:
            break
        headers = _parse_headers(buf[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = hdr_end + 4
            continue
        payload = buf[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length
        if headers.get("warc-type") != rec_type:
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        yield (
            url,
            _parse_warc_date(headers.get("warc-date", "")),
            payload.decode("utf-8", errors="replace"),
        )


def iter_wet_records(
    data: bytes,
) -> Iterator[Tuple[str, Optional[_dt.datetime], str]]:
    """WET bytes (plain or gzip-per-record) -> (url, ts, text) per
    conversion record. Same skip-don't-raise contract as
    ``warc.iter_warc_records``; the payload is the text itself (no HTTP
    envelope to strip)."""
    from corsearch_project_spark.sources.warc import _iter_gzip_members

    if data[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(data):
            yield from _iter_wet_plain(member)
    else:
        yield from _iter_wet_plain(data)


def read_wet(spark, path: str):
    """WET file(s) -> DataFrame(url, warc_ts, text). One task per file
    (binaryFile source; same 2 GiB cap and seam notes as
    ``warc.read_warc``), records streamed out in bounded Arrow batches."""
    import pyarrow as pa

    def expand(
        batches: Iterator["pa.RecordBatch"],
    ) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            contents = rb.column(rb.schema.names.index("content"))
            for content in contents:
                urls, tss, texts = [], [], []
                for url, ts, text in iter_wet_records(content.as_py() or b""):
                    urls.append(url)
                    tss.append(ts)
                    texts.append(text)
                    if len(urls) >= 1024:
                        yield _wet_batch(pa, urls, tss, texts)
                        urls, tss, texts = [], [], []
                if urls:
                    yield _wet_batch(pa, urls, tss, texts)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInArrow(expand, "url string, warc_ts timestamp, text string")
    )


def _wet_batch(pa, urls, tss, texts):
    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(texts, pa.string()),
        ],
        schema=pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.timestamp("us")),
                pa.field("text", pa.string()),
            ]
        ),
    )


def read_wet_ranges(spark, path: str, split_bytes: int = 64 << 20):
    """Splittable WET scan: (file, offset, length) ranges -> one task per
    range -> DataFrame(url, warc_ts, text). The 100-TB read path for WET
    archives — no 2 GiB file cap, per-task memory one decompressed member
    + one bounded Arrow batch.

    Reuses the WARC range machinery (``warc._SplitReader`` +
    gzip-member resync): because the writer emits one gzip member per
    record, a task landing mid-file scans forward to the next member
    magic and parses conversion records from there — identical semantics
    to ``warc.read_warc_ranges``, different record parser. Gzip WET only
    (the format this repo and Common Crawl ship); plain-text WET goes
    through :func:`read_wet`'s whole-file path.
    """
    import pyarrow as pa

    from corsearch_project_spark.sources.warc import (
        _read_gzip_member,
        _SplitReader,
        _sync_gzip_member,
        warc_manifest,
    )

    manifest = warc_manifest(path, split_bytes)
    if not manifest:
        raise FileNotFoundError(f"no WET files under {path!r}")
    mdf = spark.createDataFrame(
        manifest, "path string, offset bigint, length bigint"
    ).repartition(len(manifest))

    def expand(
        batches: Iterator["pa.RecordBatch"],
    ) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            for row in rb.to_pylist():
                fpath, offset, length = (
                    row["path"], row["offset"], row["length"]
                )
                with open(fpath, "rb") as probe:
                    if probe.read(2) != b"\x1f\x8b":
                        raise ValueError(
                            f"{fpath}: plain-text WET is not range-"
                            "splittable; use read_wet"
                        )
                end = offset + length
                urls, tss, texts = [], [], []
                with open(fpath, "rb") as fobj:
                    fobj.seek(offset)
                    r = _SplitReader(fobj, offset)
                    if not _sync_gzip_member(r, end):
                        continue
                    while r.pos < end:
                        member = _read_gzip_member(r)
                        if member is None:
                            r.consume(min(3, len(r.buf)))
                            if not _sync_gzip_member(r, end):
                                break
                            continue
                        for url, ts, text in _iter_wet_plain(member):
                            urls.append(url)
                            tss.append(ts)
                            texts.append(text)
                            if len(urls) >= 1024:
                                yield _wet_batch(pa, urls, tss, texts)
                                urls, tss, texts = [], [], []
                        if not r.ensure(3) or not r.buf.startswith(
                            b"\x1f\x8b\x08"
                        ):
                            break
                if urls:
                    yield _wet_batch(pa, urls, tss, texts)

    return mdf.mapInArrow(
        expand, "url string, warc_ts timestamp, text string"
    )
