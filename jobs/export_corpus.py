#!/usr/bin/env python3
"""Export the curated corpus as training shards — the last hop before a
tokenizer: join curation verdicts back to the extracted text, keep only
`keep=true` docs, assign token-budget pack bins inside each (split, bucket)
shard, and write parquet partitioned by split:

    spark-submit --py-files csp.zip jobs/export_corpus.py \
        --extracted /data/out/extracted --curated /data/cur/curated \
        --output /data/shards [--pack-budget 4096] [--bpe-merges K]

Layout: <out>/split=train|valid|test/..., rows
(url, extracted_text, n_tokens, quality, pred_lang, url_bucket, bin_id) —
bin_id groups contiguous docs whose token counts sum to ≤ the budget within
their (split, url_bucket) shard, so a downstream packer streams one bin at
a time. At 10^12 docs: the join is bucketed-key equi-join, the pack window
is bounded per (split, bucket) shard (never a global sort), and the write
partitions only by split (3 dirs) with bucket files inside.

``--bpe-merges K`` (default off) denominates the pack budget in REAL
subword tokens instead of whitespace words: K BPE merges are trained on
the kept corpus (operators/bpe.py — one corpus scan to the vocab-sized
word dict, K explode+partial-agg rounds over it), per-doc token counts
come from one words explode joined against the vocab-sized segmented
dict (broadcast-able) + one url-keyed partial agg, and the learned merge
table — the tokenizer artifact downstream training needs — ships WITH
the shards at ``<out>/_tokenizer/merges`` (underscore-prefixed, so shard
readers' file discovery skips it).
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
    bpe_merges: int = 0,
    text_col: str = "extracted_text",
):
    # text_col selects the serialization arm ("extracted_md" for tables
    # written with --with-markdown); it is aliased to extracted_text HERE
    # so the shard schema — and everything downstream of it — is identical
    # regardless of arm. Token budgets then count the chosen arm's tokens.
    ext = spark.read.parquet(extracted_path).select(
        "url", F.col(text_col).alias("extracted_text"), "url_bucket"
    )
    cur = spark.read.parquet(curated_path).where(F.col("keep")).select(
        "url", "n_tokens", "quality", "pred_lang", "split"
    )
    kept = ext.join(cur, "url")
    if text_col != "extracted_text" and bpe_merges == 0:
        # curated n_tokens was counted over the PLAIN text arm; markdown
        # carries extra whitespace tokens ('#'/'-'/'>' markers), so pack
        # budgets must recount over the arm actually shipped or bins
        # systematically exceed the budget in real tokens. (The BPE path
        # below already recounts over the aliased column.)
        kept = kept.drop("n_tokens").withColumn(
            "n_tokens",
            F.when(F.trim(F.col("extracted_text")) == "", F.lit(0)).otherwise(
                F.size(F.split(F.trim(F.col("extracted_text")), r"\s+"))
            ).cast("long"),
        )
    bpe_report = None
    if bpe_merges > 0:
        from corsearch_project_spark.operators import bpe as B

        merges, dic = B.bpe_train(
            kept, bpe_merges, text_col="extracted_text"
        )
        seg = dic.select(
            "word",
            F.size(F.split(F.trim(F.col("seq")), "  "))
            .cast("long")
            .alias("n_toks"),
        )
        tok = (
            kept.select(
                "url",
                F.explode(
                    F.split(F.col("extracted_text"), r"\s+")
                ).alias("word"),
            )
            .where(F.col("word") != "")
            .join(seg, "word")
            .groupBy("url")
            .agg(F.sum("n_toks").cast("long").alias("n_bpe"))
        )
        kept = (
            kept.drop("n_tokens")
            .join(tok, "url", "left")
            .withColumn(
                "n_tokens", F.coalesce(F.col("n_bpe"), F.lit(0)).cast("long")
            )
            .drop("n_bpe")
        )
        bpe_report = {"n_merges": len(merges), "merges": merges, "dic": dic}
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
    if bpe_report is not None:
        # After the shard overwrite (which truncates output_path), so the
        # artifact survives; the _ prefix keeps it out of shard readers'
        # file discovery.
        from corsearch_project_spark.operators import bpe as B

        merges_path = os.path.join(output_path, "_tokenizer", "merges")
        B.merges_df(spark, bpe_report.pop("merges")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(merges_path)
        bpe_report["merges_path"] = merges_path
        # Full subword-token census (token, n) — the vocabulary artifact +
        # coverage report beside the merges; one explode + one partial agg
        # over the vocab-sized dict.
        vocab_path = os.path.join(output_path, "_tokenizer", "vocab")
        B.token_census(bpe_report.pop("dic")).write.mode(
            "overwrite"
        ).parquet(vocab_path)
        bpe_report["vocab_path"] = vocab_path
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
    report = {
        "docs": out.count(),
        "pack_budget": pack_budget,
        "token_unit": "bpe" if bpe_report is not None else "whitespace",
        "text_col": text_col,
        "per_split": per_split,
        "output_path": output_path,
    }
    if bpe_report is not None:
        report["bpe"] = bpe_report
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--curated", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--pack-budget", type=int, default=4096)
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help="train K BPE merges on the kept corpus and "
                         "denominate the pack budget in subword tokens; "
                         "the merge table ships at <out>/_tokenizer/merges")
    ap.add_argument("--text-col", default="extracted_text",
                    help="serialization arm to export (extracted_md for "
                         "tables written with run_extract --with-markdown); "
                         "shard schema is identical either way")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    for p in (args.extracted, args.curated):
        if not os.path.exists(p):
            print(f"error: path does not exist: {p}", file=sys.stderr)
            return 1
    spark = build_session("export_corpus", master=args.master)
    report = export_corpus(
        spark, args.extracted, args.curated, args.output, args.pack_budget,
        bpe_merges=args.bpe_merges, text_col=args.text_col,
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
