"""WAT export/import — Common-Crawl-style per-page metadata records.

WAT is the third member of the Common Crawl format trio (WARC responses in,
WET text out, WAT metadata out): one WARC/1.0 ``metadata`` record per page
whose payload is a JSON document describing the page — head fields, link
census, size — the input to link-graph and index builders that never want
the page bytes. This module closes the trio for the engine: WARC ingest
(``sources/warc.py``), WET (``sources/wet.py``), CDX (``sources/cdx.py``),
WAT (here).

Layout follows Common Crawl's convention in shape (JSON payload per
metadata record, one record per page) with a flat, documented envelope
rather than CC's exact nested schema — the envelope is ours to define
since the metadata is derived from our own pages table.

Scale shape: the JSON is assembled SPARK-SIDE with ``to_json(struct(...))``
over scan-fused pure-codegen projections (title/description/lang regex
pulls, href census with a hard cap) — the single Python stage is the
byte/gzip writer shared with WET (``wet.write_records``), so per task the
peak memory is one record and the output is splittable, idempotent, and
byte-deterministic under the same contract (record-per-gzip-member,
``.inprogress`` -> ``os.replace``, mtime 0, sha256 record IDs).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from corsearch_project_spark.sources.wet import (
    CRLF,
    _iter_wet_plain,
    _warc_date,
    write_records,
)

# Hard cap on links carried per record: WAT is a metadata summary, not the
# link table — the full relation lives in linkgraph.host_edges. A page with
# 10^5 generated anchors must not produce a 10 MB metadata record.
MAX_LINKS = 100


def wat_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (url, warc_ts, meta_json): the WAT payload relation.

    Pure-codegen projection (reuses the pagemeta head-field pulls and the
    linkgraph href extractor); ``links`` is capped at MAX_LINKS with the
    true total preserved in ``n_links``. NULL-valued fields are dropped by
    to_json, keeping records minimal.
    """
    from corsearch_project_spark.operators.linkgraph import extract_hrefs
    from corsearch_project_spark.operators.pagemeta import (
        html_lang,
        html_title,
        meta_content,
    )

    h = F.col(html_col).cast("string")
    hrefs = extract_hrefs(h)
    meta = F.to_json(
        F.struct(
            F.col(url_col).alias("url"),
            F.nullif(html_title(h), F.lit("")).alias("title"),
            F.nullif(meta_content(h, "description"), F.lit("")).alias(
                "description"
            ),
            F.nullif(html_lang(h), F.lit("")).alias("lang"),
            F.length(F.col(html_col)).cast("long").alias("html_bytes"),
            F.size(hrefs).cast("long").alias("n_links"),
            F.slice(hrefs, 1, MAX_LINKS).alias("links"),
        )
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.col("warc_ts"),
        meta.alias("meta_json"),
    )


def wat_record_bytes(
    url: str, ts: Optional[_dt.datetime], meta_json: str
) -> bytes:
    """One WARC/1.0 metadata record (uncompressed bytes). Same record-ID
    determinism as WET: urn:sha256 of (url, timestamp)."""
    payload = (meta_json or "{}").encode("utf-8")
    rid = hashlib.sha256(
        (url + "\x00" + _warc_date(ts)).encode("utf-8")
    ).hexdigest()
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: metadata" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + _warc_date(ts).encode("ascii") + CRLF
        + b"WARC-Record-ID: <urn:sha256:" + rid.encode("ascii") + b">" + CRLF
        + b"Content-Type: application/json" + CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + CRLF
    )
    return headers + CRLF + payload + CRLF + CRLF


def write_wat(df, out_dir: str, prefix: str = "part"):
    """(url, warc_ts, meta_json) rows -> per-partition WAT files. See
    ``wet.write_records`` for the manifest/idempotence contract."""
    return write_records(
        df,
        out_dir,
        prefix,
        ".warc.wat.gz",
        ("url", "warc_ts", "meta_json"),
        lambda u, ts, mj: wat_record_bytes(u or "", ts, mj or "{}"),
    )


def iter_wat_records(
    data: bytes,
) -> Iterator[Tuple[str, Optional[_dt.datetime], str]]:
    """WAT bytes (plain or gzip-per-record) -> (url, ts, meta_json) per
    metadata record; skip-don't-raise on malformed headers."""
    from corsearch_project_spark.sources.warc import _iter_gzip_members

    if data[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(data):
            yield from _iter_wet_plain(member, "metadata")
    else:
        yield from _iter_wet_plain(data, "metadata")


def read_wat(spark, path: str):
    """WAT file(s) -> DataFrame(url, warc_ts, meta_json). One task per
    file (binaryFile source), records streamed in bounded Arrow batches —
    the same scan shape as ``wet.read_wet``."""
    import pyarrow as pa

    def expand(
        batches: Iterator["pa.RecordBatch"],
    ) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            contents = rb.column(rb.schema.names.index("content"))
            for content in contents:
                urls, tss, metas = [], [], []
                for u, ts, mj in iter_wat_records(content.as_py() or b""):
                    urls.append(u)
                    tss.append(ts)
                    metas.append(mj)
                    if len(urls) >= 2048:
                        yield _wat_batch(pa, urls, tss, metas)
                        urls, tss, metas = [], [], []
                if urls:
                    yield _wat_batch(pa, urls, tss, metas)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInArrow(expand, "url string, warc_ts timestamp, meta_json string")
    )


def _wat_batch(pa, urls, tss, metas):
    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(metas, pa.string()),
        ],
        names=["url", "warc_ts", "meta_json"],
    )
