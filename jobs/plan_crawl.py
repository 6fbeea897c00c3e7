#!/usr/bin/env python3
"""Plan the next crawl round: sitemaps + robots + crawled table -> a
politeness-bounded per-host fetch plan.

    spark-submit --py-files csp.zip jobs/plan_crawl.py \
        --sitemaps /data/sitemaps --robots /data/robots \
        --crawled /data/pages.parquet --output /data/plan

Chains the round-4 crawl operators end-to-end (operators/linkgraph.py):
frontier_urls (sitemap <loc> pull, dedupe, LEFT-ANTI vs crawled) ->
crawl_permissions (RFC 9309 wildcard-group longest-match) -> fetch_plan
(Crawl-delay serial bound per host). Inputs: ``--sitemaps`` a
directory/glob of sitemap XML files (one doc per file, wholetext);
``--robots`` a directory of ``<host>.txt`` robots files (host taken from
the filename); ``--crawled`` the pages parquet. Output: the plan parquet
(host, n_new, n_blocked, crawl_delay_s, est_fetch_s) plus ONE JSON line —
est_round_s is MAX(est_fetch_s): politeness serializes each host's queue,
so the round's wall-clock is the slowest host, not the sum.

Scale shape: both joins (frontier anti-join on url, permissions/delay
equi-joins on host) shuffle on their keys; nothing driver-side but the
bounded summary row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.operators import linkgraph as L
from corsearch_project_spark.plans.session import build_session


def read_robots_dir(spark, path: str):
    """<host>.txt files -> (host, robots). binaryFile + filename-derived
    host (the convention a fetcher stores robots responses under)."""
    raw = spark.read.format("binaryFile").load(
        os.path.join(path, "*.txt")
    )
    return raw.select(
        F.regexp_extract(
            F.col("path"), r"([^/]+)\.txt$", 1
        ).alias("host"),
        F.decode(F.col("content"), "utf-8").alias("robots"),
    )


def plan_crawl(spark, sitemaps_path: str, robots_path: str,
               crawled_path: str, output_path: str | None = None):
    sitemaps = (
        spark.read.option("wholetext", True).text(sitemaps_path)
        .select(F.col("value").alias("xml"))
    )
    crawled = spark.read.parquet(crawled_path).select("url")
    robots = read_robots_dir(spark, robots_path)

    new_urls = L.frontier_urls(sitemaps, crawled)
    perm = L.crawl_permissions(new_urls, robots)
    per_host = (
        perm.groupBy("host")
        .agg(
            F.sum(F.when(F.col("allowed"), 1).otherwise(0))
            .cast("long").alias("n_new"),
            F.sum(F.when(F.col("allowed"), 0).otherwise(1))
            .cast("long").alias("n_blocked"),
        )
    )
    plan = L.fetch_plan(per_host, robots).join(
        per_host.select("host", "n_blocked"), "host"
    ).select("host", "n_new", "n_blocked", "crawl_delay_s", "est_fetch_s")

    if output_path:
        plan.write.mode("overwrite").parquet(output_path)
        plan = spark.read.parquet(output_path)
    rows = plan.agg(
        F.count(F.lit(1)).alias("hosts"),
        F.sum("n_new").alias("n_new"),
        F.sum("n_blocked").alias("n_blocked"),
        F.max("est_fetch_s").alias("est_round_s"),
    ).head()
    return {
        "hosts": int(rows["hosts"] or 0),
        "n_new": int(rows["n_new"] or 0),
        "n_blocked": int(rows["n_blocked"] or 0),
        "est_round_s": int(rows["est_round_s"] or 0),
        "output": output_path,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sitemaps", required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--crawled", required=True)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    for p in (args.robots, args.crawled):
        if not os.path.exists(p):
            print(json.dumps({"error": f"no such input: {p}"}))
            return 1
    spark = build_session(app="plan_crawl")
    try:
        report = plan_crawl(
            spark, args.sitemaps, args.robots, args.crawled, args.output
        )
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
