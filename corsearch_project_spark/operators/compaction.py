"""Target-file-size compaction (SURVEY §2.3 P4) — the Iceberg
``rewrite_data_files`` maintenance action emulated over the bucketed Parquet
layout.

Small files accumulate from resume reruns (each rerun rewrites only its
pending buckets) and from salt-fanned kernel tasks. Compaction reads the
table, regroups rows by bucket so each bucket lands in exactly one task
(→ one file per ``target_records`` rows), rewrites into a fresh directory
and atomically swaps it in. At cluster scale the same job runs per-bucket
(partition-pruned) rather than whole-table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F


def table_file_stats(path: str) -> dict:
    files = []
    for root, _, names in os.walk(path):
        files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    sizes = [os.path.getsize(f) for f in files]
    return {
        "n_files": len(files),
        "bytes": sum(sizes),
        "max_file_bytes": max(sizes, default=0),
        "min_file_bytes": min(sizes, default=0),
    }


def compact_extracted(
    spark: SparkSession,
    path: str,
    buckets: int,
    target_records_per_file: int = 1_000_000,
) -> dict:
    """Rewrite the extracted table to ~one file per bucket (bounded by
    target_records_per_file) and swap directories. Returns before/after
    file stats. The swap keeps the old layout until the rewrite is fully
    committed (crash before the final rename leaves the table intact)."""
    before = table_file_stats(path)
    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__precompact"
    shutil.rmtree(tmp, ignore_errors=True)

    (
        spark.read.parquet(path)
        .repartition(buckets, "url_bucket")
        .sortWithinPartitions("url")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy("url_bucket")
        .parquet(tmp)
    )

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after = table_file_stats(path)
    return {"before": before, "after": after}
