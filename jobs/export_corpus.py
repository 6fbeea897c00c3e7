#!/usr/bin/env python3
"""Export the curated corpus as training shards — the last hop before a
tokenizer: join curation verdicts back to the extracted text, keep only
`keep=true` docs, assign token-budget pack bins inside each (split, bucket)
shard, and write parquet partitioned by split:

    spark-submit --py-files csp.zip jobs/export_corpus.py \
        --extracted /data/out/extracted --curated /data/cur/curated \
        --output /data/shards [--pack-budget 4096]

Layout: <out>/split=train|valid|test/..., rows
(url, extracted_text, n_tokens, quality, pred_lang, url_bucket, bin_id) —
bin_id groups contiguous docs whose token counts sum to ≤ the budget within
their (split, url_bucket) shard, so a downstream packer streams one bin at
a time. At 10^12 docs: the join is bucketed-key equi-join, the pack window
is bounded per (split, bucket) shard (never a global sort), and the write
partitions only by split (3 dirs) with bucket files inside.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.plans.session import build_session


def export_corpus(
    spark,
    extracted_path: str,
    curated_path: str,
    output_path: str,
    pack_budget: int = 4096,
):
    ext = spark.read.parquet(extracted_path).select(
        "url", "extracted_text", "url_bucket"
    )
    cur = spark.read.parquet(curated_path).where(F.col("keep")).select(
        "url", "n_tokens", "quality", "pred_lang", "split"
    )
    kept = ext.join(cur, "url")
    packed = kept.withColumn(
        "bin_id",
        X.pack_bins(
            F.col("n_tokens"),
            pack_budget,
            order=[F.col("url")],
            partition=[F.col("split"), F.col("url_bucket")],
        ),
    )
    (
        packed.repartition(F.col("split"), F.col("url_bucket"))
        .sortWithinPartitions("url_bucket", "bin_id", "url")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(output_path)
    )
    out = spark.read.parquet(output_path)
    per_split = {
        r["split"]: {"docs": r["docs"], "tokens": r["tokens"], "bins": r["bins"]}
        for r in out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.countDistinct("url_bucket", "bin_id").alias("bins"),
        )
        .collect()
    }
    return {
        "docs": out.count(),
        "pack_budget": pack_budget,
        "per_split": per_split,
        "output_path": output_path,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--curated", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--pack-budget", type=int, default=4096)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    for p in (args.extracted, args.curated):
        if not os.path.exists(p):
            print(f"error: path does not exist: {p}", file=sys.stderr)
            return 1
    spark = build_session("export_corpus", master=args.master)
    report = export_corpus(
        spark, args.extracted, args.curated, args.output, args.pack_budget
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
