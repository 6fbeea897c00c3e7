#!/usr/bin/env python3
"""Export a raw pages table as Common-Crawl-style WAT metadata files:

    spark-submit --py-files csp.zip jobs/export_wat.py \
        --pages /data/pages.parquet --output /data/wat [--buckets 32]

One ``part-N.warc.wat.gz`` per partition (record-per-gzip-member), rows
repartitioned by url hash bucket and sorted by url within each partition
so a re-export of the same snapshot is byte-identical (sources/wat.py
pins record IDs and gzip mtime). Recrawls dedupe to the latest fetch per
url (one url-keyed window — WAT describes the current crawl state, not
its history). The JSON payload is assembled Spark-side (to_json over
scan-fused codegen pulls); the only Python stage is the shared gzip
record writer. Prints ONE JSON line: files/records/bytes + manifest path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from corsearch_project_spark.plans.session import build_session
from corsearch_project_spark.sources.wat import wat_metadata, write_wat


def export_wat(spark, pages_path: str, output_path: str, buckets: int = 32):
    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "html")
    latest = (
        pages.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.desc("warc_ts"))
            ),
        )
        .where("_rn = 1")
        .drop("_rn")
    )
    part = (
        wat_metadata(latest)
        .repartition(buckets, F.pmod(F.xxhash64("url"), F.lit(buckets)))
        .sortWithinPartitions("url")
    )
    manifest = write_wat(part, output_path).cache()
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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not os.path.exists(args.pages):
        print(json.dumps({"error": f"no such table: {args.pages}"}))
        return 1
    spark = build_session("export_wat", master=args.master)
    print(json.dumps(export_wat(spark, args.pages, args.output, args.buckets)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
