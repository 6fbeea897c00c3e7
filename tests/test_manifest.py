"""File-level data-skipping manifest (sources/manifest.py): bounds cover
the table exactly, point lookups read only covering files, and misses cost
zero data IO."""

import os

from pyspark.sql import functions as F

from corsearch_project_spark.fixtures.gen_pages import gen_pages
from corsearch_project_spark.sources.manifest import (
    build_file_manifest,
    lookup_urls,
    prune_files,
    write_manifest,
)

from test_merge import _extract_all


def _setup(spark, tmp_path):
    base = gen_pages(80, seed=98, dup_frac=0.0)
    out = _extract_all(spark, tmp_path, base, "man")
    ext = os.path.join(out, "extracted")
    man_path = os.path.join(out, "manifest")
    write_manifest(build_file_manifest(spark, ext), man_path)
    return ext, man_path


def test_manifest_covers_table_exactly(spark, tmp_path):
    ext, man_path = _setup(spark, tmp_path)
    man = spark.read.parquet(man_path)
    data = spark.read.parquet(ext)
    assert man.agg(F.sum("rows")).head()[0] == data.count()
    # every data file appears exactly once, with correct bounds
    on_disk = set()
    for dirpath, _, files in os.walk(ext):
        for f in files:
            if f.endswith(".parquet"):
                on_disk.add(os.path.join(dirpath, f))
    listed = {r["file"].replace("file://", "") for r in man.collect()}
    assert listed == on_disk
    for r in man.collect():
        assert r["min_url"] <= r["max_url"]


def test_lookup_equals_full_scan_filter_and_prunes(spark, tmp_path):
    ext, man_path = _setup(spark, tmp_path)
    data = spark.read.parquet(ext)
    urls = [r["url"] for r in data.select("url").orderBy("url").limit(3).collect()]

    got = lookup_urls(spark, ext, man_path, urls)
    want = data.where(F.col("url").isin(urls))
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in want.collect()
    )
    assert set(got.columns) == set(data.columns)  # url_bucket retained

    man = spark.read.parquet(man_path)
    pruned = prune_files(man, urls)
    assert 0 < len(pruned) < man.count(), (
        "lookup should open a strict subset of data files"
    )


def test_lookup_miss_reads_nothing(spark, tmp_path):
    ext, man_path = _setup(spark, tmp_path)
    # a url lexicographically beyond every real one -> no covering file
    got = lookup_urls(spark, ext, man_path, ["zzz://nonexistent/url"])
    assert got.count() == 0
    assert set(got.columns) == set(spark.read.parquet(ext).columns)


def test_prune_empty_probe(spark, tmp_path):
    ext, man_path = _setup(spark, tmp_path)
    assert prune_files(spark.read.parquet(man_path), []) == []
