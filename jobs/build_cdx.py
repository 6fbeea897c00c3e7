#!/usr/bin/env python3
"""Build a CDX capture index over a directory/glob of WARC files:

    spark-submit --py-files csp.zip jobs/build_cdx.py \
        --warcs /data/warcs --output /data/cdx \
        [--split-bytes 67108864] [--partitions 0] [--probe com,example]

The index (sources/cdx.py) is the web-archive lookup layer: one row per
response record — surt sort key, capture timestamp, payload sha256, and
the (filename, offset, length) byte extent that lets a reader fetch one
ranged GET per capture. Written range-partitioned + sorted by surt, so
domain probes prune at file and row-group granularity. Prints ONE JSON
line: files scanned / records indexed / distinct urls / partitions, plus
the probe's hit count when --probe is given.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.plans.session import build_session
from corsearch_project_spark.sources.cdx import (
    cdx_lookup,
    read_warc_index,
    write_cdx,
)


def build_cdx(spark, warcs: str, output: str, split_bytes: int,
              partitions: int, probe: str | None = None):
    idx = read_warc_index(spark, warcs, split_bytes=split_bytes)
    write_cdx(idx, output, partitions=partitions)
    back = spark.read.parquet(output)
    stats = back.agg(
        F.count("*").alias("records"),
        F.countDistinct("url").alias("urls"),
        F.countDistinct("filename").alias("files"),
    ).head()
    report = {
        "records": stats["records"],
        "urls": stats["urls"],
        "files": stats["files"],
        "partitions": len(
            [p for p in os.listdir(output) if p.startswith("part-")]
        ),
        "output": output,
    }
    if probe:
        report["probe"] = probe
        report["probe_hits"] = cdx_lookup(spark, output, probe).count()
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warcs", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--split-bytes", type=int, default=64 << 20)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    if not (os.path.isdir(args.warcs) or glob.glob(args.warcs)):
        print(json.dumps({"error": f"no WARCs under: {args.warcs}"}))
        return 1
    spark = build_session(app="build_cdx")
    try:
        report = build_cdx(spark, args.warcs, args.output,
                           args.split_bytes, args.partitions, args.probe)
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
