"""File-level data-skipping manifest — Iceberg manifest-file emulation.

Iceberg tracks per-data-file column bounds in manifest files, letting a
point lookup open only the files whose [min, max] range can contain the
key. The emulated table already has the physical precondition: the sink
sorts rows by ``url`` within each bucket file (``io.write_extracted``), so
per-file url ranges are tight and disjoint-ish within a bucket. This
module materializes those bounds and uses them:

  * ``build_file_manifest`` — ONE aggregation job over (input_file_name,
    url_bucket): min/max url + row count per data file. Catalyst prunes
    the scan to the two columns (url is the sort key, so parquet
    row-group stats make even that scan cheap), and partial aggregation
    means each task emits one row per file it read — shuffle volume is
    #files, not #rows.
  * ``lookup_urls`` — prune the manifest to files whose range covers any
    probed url (a DataFrame filter over #files rows; only matched file
    paths are collected — bounded by the probe, not the table), then scan
    exactly those files. At 10^12 docs a url lookup drops from a
    750 MB bucket scan to 1–2 files.

The manifest is derivable at any time from the data (no write-path
coupling), so it can be rebuilt after merges/compaction; staleness is
detectable by comparing row totals with the lineage ledger.
"""

from __future__ import annotations

from functools import reduce
from operator import or_
from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_file_manifest(spark: SparkSession, extracted_path: str) -> DataFrame:
    df = spark.read.parquet(extracted_path)
    return (
        df.groupBy(
            F.input_file_name().alias("file"),
            F.col("url_bucket"),
        )
        .agg(
            F.min("url").alias("min_url"),
            F.max("url").alias("max_url"),
            F.count("*").alias("rows"),
        )
    )


def write_manifest(manifest: DataFrame, path: str) -> None:
    """Manifest is #files rows — a driver-small metadata table like the
    lineage ledger; one parquet file keeps reads trivial."""
    manifest.coalesce(1).write.mode("overwrite").parquet(path)


def prune_files(manifest: DataFrame, urls: Sequence[str]) -> List[str]:
    """Data files whose [min_url, max_url] range can contain any probed
    url. The range test runs as a DataFrame filter over the manifest; only
    the matched paths come back to the driver."""
    if not urls:
        return []
    cond = reduce(
        or_,
        [
            (F.lit(u) >= F.col("min_url")) & (F.lit(u) <= F.col("max_url"))
            for u in urls
        ],
    )
    return [r["file"] for r in manifest.where(cond).select("file").distinct().collect()]


def lookup_urls(
    spark: SparkSession,
    extracted_path: str,
    manifest_path: str,
    urls: Sequence[str],
) -> DataFrame:
    """Point lookup through the manifest: scan ONLY covering files.

    ``basePath`` keeps the directory-partition column (url_bucket) in the
    result even though specific files are addressed. Returns an empty
    (zero-file) relation when no file range covers any probed url — the
    common miss case costs one metadata-table filter and zero data IO."""
    manifest = spark.read.parquet(manifest_path)
    files = prune_files(manifest, urls)
    if not files:
        # no covering file: an empty relation with the extracted schema
        from corsearch_project_spark.sources.schemas import EXTRACTED_SCHEMA

        return spark.createDataFrame([], EXTRACTED_SCHEMA)
    return (
        spark.read.option("basePath", extracted_path)
        .parquet(*files)
        .where(F.col("url").isin(list(urls)))
    )
