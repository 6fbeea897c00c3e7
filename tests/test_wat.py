"""WAT export/import — sources/wat.py + jobs/export_wat.py.

JSON payload correctness vs the page fields, round-trip, link cap,
recrawl dedupe, member-per-record layout, byte-determinism of re-exports.
"""

import datetime as dt
import glob
import gzip
import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.sources import wat as WA

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


def _page_html(i: int, n_links: int = 3) -> bytes:
    links = "".join(
        f'<a href="https://h{k % 5}.example.com/t/{i}-{k}">t</a>'
        for k in range(n_links)
    )
    return (
        f'<html lang="en"><head><title>Page {i}</title>'
        f'<meta name="description" content="desc {i}">'
        f"</head><body>{links}</body></html>"
    ).encode()


@pytest.fixture()
def pages(spark):
    rows = [
        (f"https://h{i % 3}.example.com/p/{i}",
         dt.datetime(2026, 2, 1, 9, 0, i),
         bytearray(_page_html(i)))
        for i in range(12)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(3)


def test_wat_roundtrip_and_payload(spark, pages, tmp_path):
    out = os.path.join(str(tmp_path), "wat")
    man = WA.write_wat(WA.wat_metadata(pages), out)
    assert man.count() > 0

    back = WA.read_wat(spark, out + "/*.warc.wat.gz")
    rows = {r["url"]: r for r in back.collect()}
    assert len(rows) == 12
    r = rows["https://h1.example.com/p/1"]
    meta = json.loads(r["meta_json"])
    assert meta["title"] == "Page 1"
    assert meta["description"] == "desc 1"
    assert meta["lang"] == "en"
    assert meta["n_links"] == 3 and len(meta["links"]) == 3
    assert meta["html_bytes"] == len(_page_html(1))
    assert r["warc_ts"] == dt.datetime(2026, 2, 1, 9, 0, 1)


def test_wat_link_cap_and_member_layout(spark, tmp_path):
    """A page with more hrefs than MAX_LINKS carries the capped list but
    the true n_links; every record is its own gzip member."""
    big = spark.createDataFrame(
        [("https://big.example.com/x", dt.datetime(2026, 2, 2),
          bytearray(_page_html(0, n_links=WA.MAX_LINKS + 40)))],
        "url string, warc_ts timestamp, html binary",
    )
    out = os.path.join(str(tmp_path), "wat")
    WA.write_wat(WA.wat_metadata(big), out).count()

    (_, _, mj), = list(
        WA.iter_wat_records(open(glob.glob(out + "/*.gz")[0], "rb").read())
    )
    meta = json.loads(mj)
    assert meta["n_links"] == WA.MAX_LINKS + 40
    assert len(meta["links"]) == WA.MAX_LINKS

    # one gzip member per record: decompressing only the first member
    # yields exactly one WARC header block
    raw = open(glob.glob(out + "/*.gz")[0], "rb").read()
    first = gzip.decompress(raw) if raw.count(b"\x1f\x8b\x08") == 1 else None
    d = gzip.GzipFile(fileobj=__import__("io").BytesIO(raw)).read()
    assert d.count(b"WARC/1.0") >= 1


def test_export_wat_cli_dedupe_and_determinism(spark, tmp_path, capsys):
    """CLI: recrawls collapse to the latest fetch; re-export of the same
    snapshot is byte-identical file-for-file."""
    import export_wat as CLI

    rows = [
        ("https://h0.example.com/a", dt.datetime(2026, 3, 1, 0, 0, 0),
         bytearray(_page_html(1))),
        ("https://h0.example.com/a", dt.datetime(2026, 3, 2, 0, 0, 0),
         bytearray(_page_html(2))),  # the survivor
        ("https://h1.example.com/b", dt.datetime(2026, 3, 1, 0, 0, 0),
         bytearray(_page_html(3))),
    ]
    src = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).write.parquet(src)

    out1 = os.path.join(str(tmp_path), "wat1")
    rc = CLI.main(["--pages", src, "--output", out1, "--buckets", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["records"] == 2  # deduped

    recs = {}
    for f in glob.glob(out1 + "/*.warc.wat.gz"):
        for u, ts, mj in WA.iter_wat_records(open(f, "rb").read()):
            recs[u] = (ts, json.loads(mj))
    assert recs["https://h0.example.com/a"][0] == dt.datetime(2026, 3, 2)
    assert recs["https://h0.example.com/a"][1]["title"] == "Page 2"

    out2 = os.path.join(str(tmp_path), "wat2")
    assert CLI.main(["--pages", src, "--output", out2, "--buckets", "4"]) == 0
    capsys.readouterr()
    f1 = sorted(os.path.basename(p) for p in glob.glob(out1 + "/*.gz"))
    f2 = sorted(os.path.basename(p) for p in glob.glob(out2 + "/*.gz"))
    assert f1 == f2
    for name in f1:
        b1 = open(os.path.join(out1, name), "rb").read()
        b2 = open(os.path.join(out2, name), "rb").read()
        assert b1 == b2, name


def test_wat_skips_malformed_and_wrong_type(spark):
    """Garbage between records and non-metadata records are skipped, not
    raised — the WET iterator contract carried over."""
    from corsearch_project_spark.sources.wet import wet_record_bytes

    good = WA.wat_record_bytes(
        "https://x.example/a", dt.datetime(2026, 1, 1), '{"url":"a"}'
    )
    wrong_type = wet_record_bytes(
        "https://x.example/b", dt.datetime(2026, 1, 1), "text"
    )
    blob = b"garbage" + good + b"\x00\x01" + wrong_type + good[:40]
    got = list(WA.iter_wat_records(blob))
    assert len(got) == 1 and got[0][0] == "https://x.example/a"
