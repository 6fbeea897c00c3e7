"""WARC ingestion source: Common-Crawl archive files -> the ``pages`` table.

The engine's contract input is an Iceberg-style ``pages`` table
(url, warc_ts, html, text, lang — BASELINE.json:15), but Common Crawl
distributes WARC files; this source closes that gap so a reference user can
point the pipeline directly at a crawl dump:

    pages = read_warc(spark, "/data/segments/*.warc.gz")
    run_extract(spark, cfg)  # over the materialized pages table

Design (Spark-first):
  * ``spark.read.format("binaryFile")`` scans whole WARC members — WARC's
    gzip-per-record framing means a member is only splittable at record
    boundaries, which the generic reader cannot see; one file per task is
    the standard Spark strategy for .warc.gz (files are ~1 GB by CC
    convention, a good task size).
  * One ``mapInArrow`` stage parses records and emits pages rows — the same
    single-Python-stage discipline as the extraction kernel.
  * The parser is pure stdlib (zlib for gzip members), deterministic, and
    tolerant: malformed records are skipped, never raised.

Format notes (public WARC/1.0-1.1 spec, ISO 28500): records are
"WARC/1.x\\r\\n" + headers + CRLF CRLF + block + CRLF CRLF. Only
``WARC-Type: response`` records carry page payloads; the block is an HTTP
response whose body starts after the first CRLF CRLF.
"""

from __future__ import annotations

import datetime as _dt
import zlib
from typing import Iterator, List, Optional, Tuple

CRLF2 = b"\r\n\r\n"

# Feed the member decoder bounded chunks: passing the whole remaining buffer
# per member makes zlib hand back the tail via .unused_data — an O(segment)
# copy per member, O(n²) bytes over a ~1 GB per-record-gzipped CC segment.
# With 1 MiB chunks the only copies are ≤ one chunk per member boundary.
_GZ_CHUNK = 1 << 20


def gunzip_members(data: bytes) -> bytes:
    """Decompress multi-member gzip (the CC per-record framing) to one
    contiguous byte string; plain (non-gzip) input passes through."""
    if data[:2] != b"\x1f\x8b":
        return data
    return b"".join(_iter_gzip_members(data))


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        j = line.find(b":")
        if j > 0:
            headers[line[:j].strip().lower().decode("latin-1")] = (
                line[j + 1 :].strip().decode("latin-1", "replace")
            )
    return headers


def _parse_warc_date(s: str) -> Optional[_dt.datetime]:
    # WARC-Date: ISO-8601 UTC, e.g. 2024-01-17T08:31:04Z (optionally .ffffff)
    try:
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00")).replace(
            tzinfo=None
        )
    except ValueError:
        return None


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member decompressed independently — CC frames one
    record per member, so peak memory stays at record granularity instead
    of 2× the whole (up to ~1 GB) segment. The compressed buffer is walked
    through a memoryview in bounded chunks, so no per-member tail copy
    (zero-copy slices; total work is O(n) bytes)."""
    mv = memoryview(data)
    i = 0
    n = len(data)
    while i < n and bytes(mv[i : i + 2]) == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = bytearray()
        pos = i
        while pos < n and not d.eof:
            chunk = mv[pos : pos + _GZ_CHUNK]
            out += d.decompress(chunk)
            pos += len(chunk)
        if not d.eof:
            # truncated trailing member: surface what decoded, then stop
            yield bytes(out)
            return
        # unused_data is the slice of the LAST ≤1 MiB chunk past the member
        # end — a bounded copy, not the whole remaining segment
        i = pos - len(d.unused_data)
        yield bytes(out)


def parse_warc(data: bytes) -> List[Tuple[str, Optional[_dt.datetime], bytes]]:
    """WARC bytes (plain or gzip-per-record) ->
    [(url, warc_ts, http_body_bytes)] for each response record.
    Deterministic, skip-don't-raise on malformed records. Gzip input is
    decoded member-by-member (record granularity), not whole-segment."""
    if data[:2] == b"\x1f\x8b":
        out: List[Tuple[str, Optional[_dt.datetime], bytes]] = []
        for member in _iter_gzip_members(data):
            out.extend(_parse_warc_plain(member))
        return out
    return _parse_warc_plain(data)


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (hex size line + CRLF +
    chunk + CRLF, terminated by a 0-size chunk). Tolerant: on any framing
    error, return what decoded so far plus nothing — never raise."""
    out = bytearray()
    i = 0
    n = len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            break
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        start = eol + 2
        out += body[start : start + size]
        i = start + size + 2  # skip chunk + trailing CRLF
    return bytes(out)


def _http_body(block: bytes) -> bytes:
    """HTTP response block -> payload bytes: split headers at the first
    CRLF CRLF, then undo Transfer-Encoding: chunked and Content-Encoding:
    gzip/deflate when present (real CC response records carry both). A body
    we cannot decode passes through as-is (skip-don't-raise discipline)."""
    body_at = block.find(CRLF2)
    if body_at < 0:
        return block
    headers = _parse_headers(block[:body_at])
    body = block[body_at + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    ce = headers.get("content-encoding", "").lower().strip()
    try:
        if ce in ("gzip", "x-gzip"):
            body = zlib.decompress(body, 16 + zlib.MAX_WBITS)
        elif ce == "deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:  # raw-deflate servers (common misconfig)
                body = zlib.decompress(body, -zlib.MAX_WBITS)
    except zlib.error:
        pass
    return body


def _parse_warc_plain(data: bytes) -> List[Tuple[str, Optional[_dt.datetime], bytes]]:
    out: List[Tuple[str, Optional[_dt.datetime], bytes]] = []
    i = 0
    n = len(data)
    while i < n:
        start = data.find(b"WARC/", i)
        if start < 0:
            break
        hdr_end = data.find(CRLF2, start)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = hdr_end + 4
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        ts = _parse_warc_date(headers.get("warc-date", ""))
        # block = HTTP response: status line + headers, CRLF CRLF, body
        # (de-chunked / de-gzipped per the HTTP headers)
        out.append((url, ts, _http_body(block)))
    return out


def read_warc(spark, path: str):
    """WARC file(s) -> DataFrame(url, warc_ts, html, text, lang) matching
    PAGES_SCHEMA (text/lang null — they are downstream enrichments)."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )

    def expand(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            contents = rb.column(rb.schema.names.index("content"))
            urls: List[str] = []
            tss: List[Optional[_dt.datetime]] = []
            bodies: List[bytes] = []
            for content in contents:
                for url, ts, body in parse_warc(content.as_py() or b""):
                    urls.append(url)
                    tss.append(ts)
                    bodies.append(body)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(bodies, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),
                    pa.array([None] * len(urls), pa.string()),
                ],
                schema=out_schema,
            )

    from corsearch_project_spark.sources.schemas import PAGES_SCHEMA

    raw = spark.read.format("binaryFile").load(path).select("content")
    return raw.mapInArrow(expand, schema=PAGES_SCHEMA)


def build_warc(records: List[Tuple[str, _dt.datetime, bytes]], gzip_members: bool = False) -> bytes:
    """Synthesize a WARC/1.0 file from (url, ts, html_body) triples — the
    deterministic fixture writer for tests (we define the golden corpus,
    SURVEY §5.3); optionally gzip-per-record like real CC files."""
    out = bytearray()
    for url, ts, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)
