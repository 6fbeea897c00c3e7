"""Sitemap export: crawled-table urls -> sitemaps.org urlset shards.

The emit side of the discovery loop whose parse side is
``linkgraph.sitemap_locs``/``crawl_frontier``: a site (or an archive
republishing a crawl) exposes its url inventory as sitemap files, capped
by the protocol at **50 000 urls and 50 MB uncompressed per file**, with
a ``sitemapindex`` document listing the shards (sitemaps.org/protocol —
public spec). At 10^12 urls that is ~20M shard files, so the export must
be a distributed write with a bounded driver: every shard is written by
the task that owns its rows (same ``mapInArrow`` + inprogress->replace
idempotent-retry shape as ``wet.write_wet``), and only the shard
MANIFEST (file, n_urls, n_bytes) comes back — the index document is
generated from the manifest, and for counts beyond the 50k-entry index
limit the index itself shards (``sitemapindex-N.xml``; the protocol
allows nesting).

Determinism: rows are hash-repartitioned on url (deterministic for a
fixed shard count, unlike range sampling) and sorted within partitions,
and gzip mtime is pinned to 0 — re-exporting the same table is
byte-identical, which is what makes export diffs meaningful.
"""

from __future__ import annotations

import gzip
import os
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, functions as F

MAX_URLS_PER_FILE = 50_000
MAX_BYTES_PER_FILE = 50 * 1024 * 1024  # uncompressed, per the protocol
_XML_HEAD = b'<?xml version="1.0" encoding="UTF-8"?>\n'
_URLSET_OPEN = (
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
)
_URLSET_CLOSE = b"</urlset>\n"


def xml_escape(s: str) -> str:
    """Minimal XML text escaping for <loc> values (spec requires entity
    escaping; urls legally contain '&')."""
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
    )


def _url_entry(url: str, lastmod) -> bytes:
    lm = (
        f"<lastmod>{lastmod.strftime('%Y-%m-%dT%H:%M:%SZ')}</lastmod>"
        if lastmod is not None
        else ""
    )
    return f"<url><loc>{xml_escape(url)}</loc>{lm}</url>\n".encode()


def write_sitemaps(
    df: DataFrame,
    out_dir: str,
    shards: int,
    max_urls: int = MAX_URLS_PER_FILE,
    max_bytes: int = MAX_BYTES_PER_FILE,
    prefix: str = "sitemap",
) -> DataFrame:
    """(url [, lastmod]) rows -> gzipped urlset files, ≤max_urls and
    ≤max_bytes (uncompressed) each; a partition whose rows exceed the
    caps rolls over to ``{prefix}-{pid}-{k}.xml.gz`` chunk files.

    Returns the manifest DataFrame (file, n_urls, n_bytes) — one row per
    written file; materializing it executes the write (keep it: it is
    the export's lineage record and the index generator's input)."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns
    src = df.select(
        "url",
        (F.col("lastmod") if "lastmod" in cols else F.lit(None).cast("timestamp")).alias("lastmod"),
    ).repartition(shards, "url").sortWithinPartitions("url")

    out_schema = "file string, n_urls long, n_bytes long"

    def write_partition(
        batches: Iterator["pa.RecordBatch"],
    ) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        results: List[Tuple[str, int, int]] = []
        chunk = 0
        body = bytearray()
        n = 0

        def flush():
            nonlocal chunk, body, n
            if n == 0:
                return
            final = os.path.join(
                out_dir, f"{prefix}-{pid:05d}-{chunk:03d}.xml.gz"
            )
            tmp = final + ".inprogress"
            payload = _XML_HEAD + _URLSET_OPEN + bytes(body) + _URLSET_CLOSE
            with open(tmp, "wb") as fh:
                fh.write(gzip.compress(payload, mtime=0))
            os.replace(tmp, final)
            results.append((final, n, len(payload)))
            chunk += 1
            body = bytearray()
            n = 0

        for rb in batches:
            urls = rb.column(rb.schema.names.index("url"))
            lms = rb.column(rb.schema.names.index("lastmod"))
            for u, lm in zip(urls, lms):
                entry = _url_entry(u.as_py() or "", lm.as_py())
                if n and (
                    n >= max_urls
                    or len(body) + len(entry) + 200 > max_bytes
                ):
                    flush()
                body += entry
                n += 1
        flush()
        if not results:
            return
        files, nus, nbs = zip(*results)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(files, pa.string()),
                pa.array(nus, pa.int64()),
                pa.array(nbs, pa.int64()),
            ],
            names=["file", "n_urls", "n_bytes"],
        )

    return src.mapInArrow(write_partition, out_schema)


def write_sitemap_index(
    manifest_files: List[str],
    out_dir: str,
    base_url: str = "",
    max_entries: int = MAX_URLS_PER_FILE,
) -> List[str]:
    """Manifest file list -> sitemapindex document(s). Bounded driver
    work: one entry per shard FILE (not per url), itself sharded past
    the 50k-entry protocol cap. ``base_url`` prefixes each <loc> (the
    published location of the shard files)."""
    files = sorted(manifest_files)
    out_paths: List[str] = []
    for i in range(0, len(files), max_entries) or [0]:
        part = files[i : i + max_entries]
        name = (
            "sitemapindex.xml"
            if len(files) <= max_entries
            else f"sitemapindex-{i // max_entries:03d}.xml"
        )
        path = os.path.join(out_dir, name)
        body = bytearray(_XML_HEAD)
        body += b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        for f in part:
            loc = base_url + os.path.basename(f)
            body += f"<sitemap><loc>{xml_escape(loc)}</loc></sitemap>\n".encode()
        body += b"</sitemapindex>\n"
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(bytes(body))
        os.replace(tmp, path)
        out_paths.append(path)
    return out_paths
