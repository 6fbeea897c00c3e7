"""CDX capture index (sources/cdx.py): every indexed byte extent must
reproduce its record with one ranged read, split scans must agree with
whole-file scans, and the written index must actually prune prefix probes
(sorted layout + pushed StringStartsWith)."""

import datetime as dt
import hashlib
import os
import zlib

import pytest

from pyspark.sql import functions as F

from corsearch_project_spark.sources.cdx import (
    cdx_lookup,
    read_warc_index,
    write_cdx,
)
from corsearch_project_spark.sources.warc import build_warc


def _mk_corpus(tmp_path, n=30):
    recs = [
        (
            f"https://h{i % 5}.example.com/p/{i}",
            dt.datetime(2026, 1, 1, 0, 0, i % 60),
            b"<html><body>doc %d</body></html>" % i,
        )
        for i in range(n)
    ]
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(build_warc(recs[: n // 2], gzip_members=True))
    (d / "b.warc").write_bytes(build_warc(recs[n // 2 :], gzip_members=False))
    return str(d), recs


def _http_payload(record_bytes: bytes) -> bytes:
    # WARC header CRLF2 HTTP-headers CRLF2 payload (fixture bodies are raw)
    block = record_bytes.split(b"\r\n\r\n", 1)[1]
    return block.split(b"\r\n\r\n", 1)[1]


def test_index_extents_seek_roundtrip(spark, tmp_path):
    """The CDX contract: (filename, offset, length) + one inflate must
    reproduce the record — for gzip members AND plain records, across
    splits far smaller than the files."""
    d, recs = _mk_corpus(tmp_path)
    rows = read_warc_index(spark, d, split_bytes=1500).collect()
    assert len(rows) == len(recs)
    for r in rows:
        with open(os.path.join(d, r["filename"]), "rb") as f:
            f.seek(r["offset"])
            blob = f.read(r["length"])
        if r["filename"].endswith(".gz"):
            blob = zlib.decompress(blob, 16 + zlib.MAX_WBITS)
        assert blob.startswith(b"WARC/1.0")
        assert f"WARC-Target-URI: {r['url']}".encode() in blob
        # digest = sha256 of the decoded HTTP payload
        payload = _http_payload(blob.rstrip(b"\r\n"))
        assert r["digest"] == hashlib.sha256(payload).hexdigest()


def test_split_scan_equals_whole_file(spark, tmp_path):
    d, recs = _mk_corpus(tmp_path)
    whole = sorted(map(tuple, read_warc_index(spark, d, split_bytes=1 << 30).collect()))
    split = sorted(map(tuple, read_warc_index(spark, d, split_bytes=700).collect()))
    assert whole == split
    assert len(whole) == len(recs)


def test_index_scan_is_one_python_stage(spark, tmp_path):
    d, _ = _mk_corpus(tmp_path, n=10)
    plan = (
        read_warc_index(spark, d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1


def test_written_index_sorted_and_pruned_lookup(spark, tmp_path):
    """write_cdx: rows sorted by surt inside every parquet file; lookups
    equal the full-scan filter and carry a pushed StartsWith."""
    d, recs = _mk_corpus(tmp_path)
    idx_path = str(tmp_path / "index")
    idx = read_warc_index(spark, d)
    write_cdx(idx, idx_path, partitions=4)

    import pyarrow.parquet as pq

    for part in os.listdir(idx_path):
        if not part.endswith(".parquet"):
            continue
        surts = pq.read_table(os.path.join(idx_path, part), columns=["surt"])
        vals = surts.column("surt").to_pylist()
        assert vals == sorted(vals), part

    hit = cdx_lookup(spark, idx_path, "com,example,h3")
    want = {u for (u, _, _) in recs if u.startswith("https://h3.")}
    assert {r["url"] for r in hit.collect()} == want

    full = spark.read.parquet(idx_path).where(
        F.col("surt").startswith("com,example,h3")
    )
    assert hit.count() == full.count()

    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan  # pushed parquet filter


def test_domain_probe_covers_subdomains(spark, tmp_path):
    """Reversed-host ordering: the registrable-domain prefix catches every
    subdomain — the lookup a plain-url sort cannot serve contiguously."""
    d, recs = _mk_corpus(tmp_path)
    idx_path = str(tmp_path / "index2")
    write_cdx(read_warc_index(spark, d), idx_path, partitions=2)
    hits = cdx_lookup(spark, idx_path, "com,example").count()
    assert hits == len(recs)  # h0..h4 are all *.example.com


def test_index_total_on_corrupt_archives(spark, tmp_path):
    """Seeded corruption mid-archive: the indexer must not raise, must
    resync past damage, and every extent it DOES emit must still
    seek-reproduce its record (no off-by-N drift after resync)."""
    import random
    import zlib as _z

    d, recs = _mk_corpus(tmp_path, n=24)
    rng = random.Random(20260819)
    for name in ("a.warc.gz", "b.warc"):
        p = os.path.join(d, name)
        blob = bytearray(open(p, "rb").read())
        # three random 16-byte stomps, away from the file head
        for _ in range(3):
            at = rng.randrange(len(blob) // 4, len(blob) - 16)
            for i in range(16):
                blob[at + i] ^= 0x5A
        open(p, "wb").write(bytes(blob))

    rows = read_warc_index(spark, d, split_bytes=900).collect()
    assert 0 < len(rows) <= len(recs)  # damaged records dropped, not fatal
    for r in rows:
        with open(os.path.join(d, r["filename"]), "rb") as f:
            f.seek(r["offset"])
            blob = f.read(r["length"])
        if r["filename"].endswith(".gz"):
            blob = _z.decompress(blob, 16 + _z.MAX_WBITS)
        assert f"WARC-Target-URI: {r['url']}".encode() in blob
