"""WARC export: pages rows -> Common-Crawl-layout WARC response files.

The archival inverse of ``warc.read_warc``/``read_warc_ranges`` and the
response-record sibling of ``wet.write_wet``: a pipeline that ingests
WARCs must also be able to RE-publish a (merged, deduped, re-crawled)
pages table as WARCs — that is how crawl snapshots are exchanged — and
the export must round-trip: ``read_warc(write_warc(t)) == t`` and the
CDX indexer (``sources/cdx.py``) must index the output directly. Layout
follows the CC convention this repo's readers rely on: WARC/1.0 response
records, one gzip member per record (so the files are splittable by the
range scan), HTTP/1.1 200 envelope around the stored body.

Determinism: rows are hash-repartitioned on url and sorted within
partitions, record ids derive from (url, date) and gzip mtime is pinned
to 0, so re-exporting the same table is byte-identical (same rule as
WET/sitemap export — deterministic artifacts make export diffs
meaningful). Writer is the idempotent inprogress->replace mapInArrow
shape; only the (file, n_records, n_bytes) manifest reaches the driver.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import os
from typing import Iterator, Optional

from pyspark.sql import DataFrame, functions as F

CRLF = b"\r\n"


def _warc_date(ts: Optional[_dt.datetime]) -> str:
    ts = ts or _dt.datetime(1970, 1, 1)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_response_bytes(
    url: str, ts: Optional[_dt.datetime], body: bytes,
    content_type: str = "text/html",
) -> bytes:
    """One WARC/1.0 response record (uncompressed): the HTTP envelope is
    a minimal 200 with Content-Type + Content-Length — enough for
    ``warc._http_body`` (and any warcio-style reader) to recover the
    exact stored body."""
    body = body or b""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: " + content_type.encode("ascii") + CRLF
        + b"Content-Length: " + str(len(body)).encode("ascii") + CRLF
        + CRLF + body
    )
    rid = hashlib.sha256(
        (url + "\x00" + _warc_date(ts)).encode("utf-8")
    ).hexdigest()
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + _warc_date(ts).encode("ascii") + CRLF
        + b"WARC-Record-ID: <urn:sha256:" + rid.encode("ascii") + b">" + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http)).encode("ascii") + CRLF
    )
    return headers + CRLF + http + CRLF + CRLF


def write_warc(
    df: DataFrame,
    out_dir: str,
    shards: int = 0,
    prefix: str = "part",
) -> DataFrame:
    """(url, warc_ts, html) rows -> ``{prefix}-NNNNN.warc.gz`` files,
    one gzip member per record (mtime 0). Returns the manifest DataFrame
    (file, n_records, n_bytes) — materialize it to execute the write and
    keep it as the export's lineage record."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    src = df.select("url", "warc_ts", "html")
    if shards:
        src = src.repartition(shards, "url")
    else:
        src = src.repartition("url")
    src = src.sortWithinPartitions("url")

    def write_partition(
        batches: Iterator["pa.RecordBatch"],
    ) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"{prefix}-{pid:05d}.warc.gz")
        tmp = final + ".inprogress"
        n = 0
        with open(tmp, "wb") as out:
            for rb in batches:
                urls = rb.column(rb.schema.names.index("url"))
                tss = rb.column(rb.schema.names.index("warc_ts"))
                bodies = rb.column(rb.schema.names.index("html"))
                for u, ts, b in zip(urls, tss, bodies):
                    rec = warc_response_bytes(
                        u.as_py() or "", ts.as_py(), b.as_py() or b""
                    )
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
            names=["file", "n_records", "n_bytes"],
        )

    return src.mapInArrow(
        write_partition, "file string, n_records long, n_bytes long"
    )
