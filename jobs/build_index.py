#!/usr/bin/env python3
"""Build (or incrementally update) the term-bucketed search index over an
extracted table:

    spark-submit --py-files csp.zip jobs/build_index.py \
        --extracted /data/out/extracted --output /data/index \
        [--buckets 64] [--increment /data/out2/extracted] \
        [--probe term1,term2]

Full build: extracted text -> posting relation (term, doc_id, tf; one
explode + one shuffle, operators/search.py C19) -> term-bucketed persist
(term_bucket partition column, so a query's term filter is partition
pruning — the serving contract of `lookup_postings`). With --increment,
stale postings for re-extracted urls are dropped and fresh ones unioned
(update_postings, pinned ≡ full rebuild) before persisting. Prints ONE
JSON line: postings/terms/docs/buckets, plus probe term hit counts (via
the bucket-pruned lookup) when --probe is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.plans.session import build_session
from corsearch_project_spark.operators.search import (
    build_postings,
    lookup_postings,
    update_postings,
    write_postings,
)


def _docs(spark, extracted_path: str):
    # url is the stable doc identity of the extracted table; postings key
    # on it directly (doc_id = url) so increments can drop stale rows.
    return spark.read.parquet(extracted_path).select(
        F.col("url").alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )


def build_index(spark, extracted: str, output: str, buckets: int,
                increment: str | None = None, probe: str | None = None):
    postings = build_postings(_docs(spark, extracted))
    if increment:
        postings = update_postings(postings, _docs(spark, increment))
    write_postings(postings, output, n_buckets=buckets)
    back = spark.read.parquet(output)
    stats = back.agg(
        F.count("*").alias("postings"),
        F.countDistinct("term").alias("terms"),
        F.countDistinct("doc_id").alias("docs"),
    ).head()
    report = {
        "postings": stats["postings"],
        "terms": stats["terms"],
        "docs": stats["docs"],
        "buckets": buckets,
        "output": output,
    }
    if probe:
        terms = [t for t in probe.split(",") if t]
        hits = (
            lookup_postings(spark, output, terms, n_buckets=buckets)
            .groupBy("term").agg(F.count("*").alias("n")).collect()
        )
        report["probe"] = {r["term"]: r["n"] for r in hits}
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--increment", default=None)
    ap.add_argument("--probe", default=None)
    args = ap.parse_args()
    if not os.path.exists(args.extracted):
        print(json.dumps({"error": f"no such table: {args.extracted}"}))
        return 1
    spark = build_session(app="build_index")
    try:
        report = build_index(spark, args.extracted, args.output,
                             args.buckets, args.increment, args.probe)
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
