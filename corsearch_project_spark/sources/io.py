"""Iceberg-style table IO over Parquet (SURVEY §2.1 S1–S5).

No Iceberg/Delta jars exist offline (SURVEY §0.1), so Iceberg semantics are
emulated and isolated behind ``TableFormat``: bucket-transform partitioning
(directory partition column ``url_bucket``), dynamic-overwrite idempotent
commits, target-file-size via maxRecordsPerFile, and a lineage/metrics table
standing in for snapshot metadata. On a cluster with Iceberg jars, swap
``ParquetBucketedFormat`` for a catalog-backed implementation
(``CREATE TABLE ... PARTITIONED BY (bucket(B, url))``) without touching the
pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from corsearch_project_spark.sources.schemas import (
    EXTRACTED_SCHEMA,
    LINEAGE_SCHEMA,
    PAGES_SCHEMA,
)


def scan_pages(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: fixed-schema scan; predicate/partition pruning applies when the
    caller filters on url_bucket (bucketed layout) or lang/warc_ts (row-group
    min/max skip)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def scan_pages_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Scan a bucketed pages table (written with partitionBy url_bucket);
    url_bucket comes back as a partition column usable for pruning."""
    return spark.read.parquet(path)


class ParquetBucketedFormat:
    """The TableFormat seam (SURVEY §7 hard-part 5)."""

    def __init__(self, max_records_per_file: int = 50_000):
        self.max_records_per_file = max_records_per_file

    def write_extracted(self, df: DataFrame, path: str) -> None:
        """S3: bucketed sink. Rows arrive already repartitioned on
        (url_bucket, salt); sortWithinPartitions('url') clusters files for
        url range-lookup; dynamic partition overwrite makes resume reruns
        idempotent (only pending buckets are replaced).

        partitionOverwriteMode is pinned HERE, writer-level (overrides any
        session conf): with the session default (static), mode('overwrite')
        .partitionBy(...) clears the whole table root, so calling run_merge
        from a default-conf SparkSession would silently delete every
        untouched bucket (round-2 ADVICE — data loss, not an error)."""
        (
            df.sortWithinPartitions("url")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", self.max_records_per_file)
            .partitionBy("url_bucket")
            .parquet(path)
        )

    def read_extracted(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def append_lineage(self, df: DataFrame, path: str) -> None:
        """S4: append-only metrics table (small: B rows per run)."""
        df.write.mode("append").parquet(path)

    def read_lineage(self, spark: SparkSession, path: str) -> Optional[DataFrame]:
        try:
            return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
        except Exception:
            return None


def done_buckets(
    spark: SparkSession, fmt: ParquetBucketedFormat, lineage_path: str, run_id: str
) -> List[int]:
    """P5 resume input: buckets already committed for this run_id. B is small
    (≤ thousands) so collecting to a literal list lets the scan-side filter
    prune partitions instead of joining."""
    lin = fmt.read_lineage(spark, lineage_path)
    if lin is None:
        return []
    rows = (
        lin.where((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("url_bucket")
        .distinct()
        .collect()
    )
    return sorted(r["url_bucket"] for r in rows)
