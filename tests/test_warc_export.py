"""WARC export (sources/warc_export.py): the archival round-trip — rows
written by write_warc must come back exactly through read_warc AND
read_warc_ranges, index cleanly through build-CDX machinery, and
re-export byte-identically."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from corsearch_project_spark.sources.cdx import read_warc_index
from corsearch_project_spark.sources.warc import read_warc, read_warc_ranges
from corsearch_project_spark.sources.warc_export import write_warc


def _pages(spark, n=40):
    rows = [
        (
            f"https://h{i % 5}.example.com/p/{i}",
            dt.datetime(2026, 2, 1, 0, i % 60, 0),
            b"<html><body>doc %d</body></html>" % i,
        )
        for i in range(n)
    ]
    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_roundtrip_through_both_readers(spark, tmp_path):
    out = str(tmp_path / "warcs")
    df = _pages(spark)
    manifest = write_warc(df, out, shards=3).collect()
    assert sum(r["n_records"] for r in manifest) == 40
    assert all(r["file"].endswith(".warc.gz") for r in manifest)

    want = {
        (r["url"], r["warc_ts"], bytes(r["html"])) for r in df.collect()
    }
    whole = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in read_warc(spark, out).select("url", "warc_ts", "html").collect()
    }
    assert whole == want
    ranged = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in read_warc_ranges(spark, out, split_bytes=1024)
        .select("url", "warc_ts", "html").collect()
    }
    assert ranged == want


def test_export_indexes_through_cdx(spark, tmp_path):
    """The CDX indexer treats the export like any CC archive: one member
    extent per record, all urls indexed."""
    out = str(tmp_path / "warcs")
    write_warc(_pages(spark), out, shards=2).collect()
    idx = read_warc_index(spark, out).collect()
    assert len(idx) == 40
    assert len({(r["filename"], r["offset"]) for r in idx}) == 40


def test_reexport_is_byte_identical(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _pages(spark)
    write_warc(df, a, shards=3).collect()
    write_warc(df.repartition(7), b, shards=3).collect()
    fa = sorted(f for f in os.listdir(a) if f.endswith(".warc.gz"))
    fb = sorted(f for f in os.listdir(b) if f.endswith(".warc.gz"))
    assert fa == fb
    for name in fa:
        assert (
            open(os.path.join(a, name), "rb").read()
            == open(os.path.join(b, name), "rb").read()
        ), name
