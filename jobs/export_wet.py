#!/usr/bin/env python3
"""Export an extracted table as Common-Crawl-style WET files:

    spark-submit --py-files csp.zip jobs/export_wet.py \
        --extracted /data/out/extracted --output /data/wet \
        [--pages /data/pages.parquet]

One ``part-N.warc.wet.gz`` per partition (record-per-gzip-member, so the
output is splittable again by the WARC range scan), rows repartitioned by
url_bucket and sorted by url within each partition so a re-export of the
same snapshot is byte-identical (sources/wet.py pins record IDs and gzip
mtime). ``--pages`` supplies WARC-Date from the original crawl
(bucketed-key equi-join on url); without it records carry the epoch
placeholder. Prints ONE JSON line: files/records/bytes + the manifest
path — the manifest parquet IS the export's lineage record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.plans.session import build_session
from corsearch_project_spark.sources.wet import write_wet


def export_wet(spark, extracted_path: str, output_path: str,
               pages_path: str | None = None):
    ext = spark.read.parquet(extracted_path).select(
        "url", F.col("extracted_text").alias("text"), "url_bucket"
    )
    if pages_path:
        # A crawl table carries recrawls (same url, several warc_ts); the
        # export must stay 1:1 with the extracted table, so take the
        # latest fetch per url (partial-agg, no fan-out on the join).
        ts = (
            spark.read.parquet(pages_path)
            .groupBy("url")
            .agg(F.max("warc_ts").alias("warc_ts"))
        )
        ext = ext.join(ts, "url", "left")
    else:
        ext = ext.withColumn(
            "warc_ts", F.lit("1970-01-01 00:00:00").cast("timestamp")
        )
    part = (
        ext.repartition(F.col("url_bucket"))
        .sortWithinPartitions("url")
        .select("url", "warc_ts", "text")
    )
    manifest = write_wet(part, output_path).cache()
    rows = manifest.collect()
    man_path = os.path.join(output_path, "_manifest")
    manifest.coalesce(1).write.mode("overwrite").parquet(man_path)
    manifest.unpersist()
    return {
        "files": len(rows),
        "records": int(sum(r["n_records"] for r in rows)),
        "bytes": int(sum(r["n_bytes"] for r in rows)),
        "output": output_path,
        "manifest": man_path,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--pages", default=None)
    args = ap.parse_args()
    if not os.path.exists(args.extracted):
        print(json.dumps({"error": f"no such table: {args.extracted}"}))
        return 1
    spark = build_session(app="export_wet")
    try:
        report = export_wet(spark, args.extracted, args.output, args.pages)
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
