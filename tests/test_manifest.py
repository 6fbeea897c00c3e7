"""File-level data-skipping manifest (sources/manifest.py): bounds cover
the table exactly, point lookups read only covering files, and misses cost
zero data IO."""

import os

from pyspark.sql import functions as F

from corsearch_project_spark.fixtures.gen_pages import gen_pages
import pytest

from corsearch_project_spark.sources.manifest import (
    StaleManifestError,
    build_file_manifest,
    lookup_urls,
    lookup_urls_df,
    prune_files,
    prune_files_df,
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


def test_bulk_probe_range_join(spark, tmp_path):
    """A 10k-url probe list goes through the broadcast range join — the
    plan must be a BroadcastNestedLoopJoin over the manifest, NOT a
    10k-term literal predicate — and must return the same covering files
    as the per-url predicate, plus the same lookup rows as a full scan."""
    ext, man_path = _setup(spark, tmp_path)
    data = spark.read.parquet(ext)
    real = [r["url"] for r in data.select("url").limit(5).collect()]
    urls = real + [f"https://probe-{i:05d}.example.test/x" for i in range(9995)]

    man = spark.read.parquet(man_path)
    probe = spark.createDataFrame([(u,) for u in urls], "url string")

    # plan gate: range join, broadcast probe side, no giant OR predicate
    joined = man.join(
        F.broadcast(probe.select(F.col("url").alias("__probe_url")).distinct()),
        (F.col("__probe_url") >= F.col("min_url"))
        & (F.col("__probe_url") <= F.col("max_url")),
        "left_semi",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan

    assert sorted(prune_files_df(man, probe)) == sorted(prune_files(man, real))

    got = lookup_urls_df(spark, ext, man_path, probe)
    want = data.where(F.col("url").isin(real))
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in want.collect()
    )

    # lookup_urls itself auto-switches to the DF path at >=64 probes and
    # stays correct
    got2 = lookup_urls(spark, ext, man_path, urls[:80])
    want2 = data.where(F.col("url").isin(urls[:80]))
    assert sorted(r["url"] for r in got2.collect()) == sorted(
        r["url"] for r in want2.collect()
    )


def test_manifest_freshness_guard(spark, tmp_path):
    """A manifest stamped at commit seq S must be rejected once the ledger
    advances past S (stale lookups silently return incomplete results)."""
    from test_maintenance import _merge, _swap_body

    base = gen_pages(60, seed=99, dup_frac=0.0)
    out = _extract_all(spark, tmp_path, base, "fresh")
    ext = os.path.join(out, "extracted")
    man_path = os.path.join(out, "manifest")
    snap_path = os.path.join(out, "snapshots")

    write_manifest(build_file_manifest(spark, ext), man_path, snapshots_path=snap_path)
    url0 = spark.read.parquet(ext).select("url").first()["url"]
    # fresh: guard passes, lookup works
    assert lookup_urls(
        spark, ext, man_path, [url0], snapshots_path=snap_path
    ).count() == 1

    # advance the ledger with a merge commit -> manifest is now stale
    _merge(spark, out, tmp_path, [_swap_body(base[0], base[1])], "MF")
    with pytest.raises(StaleManifestError):
        lookup_urls(spark, ext, man_path, [url0], snapshots_path=snap_path)
    probe = spark.createDataFrame([(url0,)], "url string")
    with pytest.raises(StaleManifestError):
        lookup_urls_df(spark, ext, man_path, probe, snapshots_path=snap_path)

    # unstamped manifest + guard requested -> explicit error, not silence
    write_manifest(build_file_manifest(spark, ext), man_path)
    with pytest.raises(StaleManifestError):
        lookup_urls(spark, ext, man_path, [url0], snapshots_path=snap_path)

    # rebuild with the stamp -> guard passes again
    write_manifest(build_file_manifest(spark, ext), man_path, snapshots_path=snap_path)
    assert lookup_urls(
        spark, ext, man_path, [url0], snapshots_path=snap_path
    ).count() == 1
