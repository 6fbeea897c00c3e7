"""Sitemap export (sources/sitemaps.py): protocol caps, escaping,
byte-determinism, and the round-trip through the IMPORT side — urls
written by write_sitemaps must come back exactly through
linkgraph.sitemap_locs / crawl_frontier."""

import gzip
import os

from pyspark.sql import functions as F

from corsearch_project_spark.operators import linkgraph as L
from corsearch_project_spark.sources.sitemaps import (
    write_sitemap_index,
    write_sitemaps,
    xml_escape,
)


def _urls_df(spark, n=100):
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
        ).alias("url")
    )


def _read_all(out_dir):
    texts = {}
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".xml.gz"):
            texts[f] = gzip.decompress(
                open(os.path.join(out_dir, f), "rb").read()
            ).decode()
    return texts


def test_roundtrip_through_sitemap_locs(spark, tmp_path):
    out = str(tmp_path / "sm")
    df = _urls_df(spark, 100)
    manifest = write_sitemaps(df, out, shards=4).collect()
    assert sum(r["n_urls"] for r in manifest) == 100

    xml_rows = [(t,) for t in _read_all(out).values()]
    back = (
        spark.createDataFrame(xml_rows, "xml string")
        .select(F.explode(L.sitemap_locs(F.col("xml"))).alias("url"))
    )
    got = {r["url"] for r in back.collect()}
    want = {r["url"] for r in df.collect()}
    assert got == want


def test_caps_roll_over_to_chunks(spark, tmp_path):
    out = str(tmp_path / "sm")
    manifest = write_sitemaps(
        _urls_df(spark, 100), out, shards=2, max_urls=10
    ).collect()
    assert all(r["n_urls"] <= 10 for r in manifest)
    assert len(manifest) >= 10  # 100 urls / 10-per-file across 2 shards
    # chunk files are named per (partition, chunk)
    assert any("-001.xml.gz" in r["file"] for r in manifest)


def test_escaping_and_lastmod(spark, tmp_path):
    import datetime as dt

    out = str(tmp_path / "sm")
    df = spark.createDataFrame(
        [("https://ex.com/p?a=1&b=<2>", dt.datetime(2026, 3, 1, 12, 0, 0))],
        "url string, lastmod timestamp",
    )
    write_sitemaps(df, out, shards=1).collect()
    text = "".join(_read_all(out).values())
    assert "a=1&amp;b=&lt;2&gt;" in text
    assert "<lastmod>2026-03-01T12:00:00Z</lastmod>" in text
    assert xml_escape("a&b") == "a&amp;b"


def test_export_is_byte_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _urls_df(spark, 200)
    write_sitemaps(df, a, shards=3).collect()
    write_sitemaps(df.repartition(11), b, shards=3).collect()
    fa, fb = _read_all(a), _read_all(b)
    assert list(fa) == list(fb)
    for k in fa:
        ra = gzip.decompress(open(os.path.join(a, k), "rb").read())
        rb = gzip.decompress(open(os.path.join(b, k), "rb").read())
        assert ra == rb, k
        # raw gz bytes too (mtime pinned)
        assert (
            open(os.path.join(a, k), "rb").read()
            == open(os.path.join(b, k), "rb").read()
        )


def test_sitemap_index_lists_all_shards_and_parses(spark, tmp_path):
    out = str(tmp_path / "sm")
    manifest = write_sitemaps(_urls_df(spark, 60), out, shards=3).collect()
    paths = write_sitemap_index(
        [r["file"] for r in manifest], out,
        base_url="https://ex.com/sitemaps/",
    )
    assert len(paths) == 1 and paths[0].endswith("sitemapindex.xml")
    idx = open(paths[0]).read()
    for r in manifest:
        assert os.path.basename(r["file"]) in idx
    # the import side understands sitemapindex documents
    locs = (
        spark.createDataFrame([(idx,)], "xml string")
        .select(F.explode(L.sitemap_locs(F.col("xml"))).alias("u"))
        .collect()
    )
    assert len(locs) == len(manifest)
    assert all(r["u"].startswith("https://ex.com/sitemaps/") for r in locs)
