#!/usr/bin/env python3
"""Incremental curation: dedup a NEW extraction increment against the
EXISTING curated corpus without rescanning prior text.

    spark-submit --py-files csp.zip jobs/curate_increment.py \
        --increment /data/out2/extracted --prior /data/curated \
        --output /data/curated_inc [--min-quality 0.3] [--est-jaccard 0.5]

The batch job (jobs/run_curation.py) persists two relations the increment
path needs: <prior>/curated (keep verdicts + text_sha256 per url) and
<prior>/signatures (the wide MinHash signature store). This job then:

  1. drops increment rows whose url already exists in the prior curated
     table (re-crawls of known urls are the MERGE pipeline's business —
     jobs/merge_increment.py replaces the row, and a later full curation
     re-scores it; curation increments are for NEW urls)
  2. exact dedup: within-increment sha groups (min-url canonical) AND
     vs prior — an increment doc whose text_sha256 matches any prior
     KEPT doc is a duplicate of the corpus (left-semi join on the digest)
  3. near-dup: increment signatures band-join (a) themselves (within-
     increment clusters -> connected components, min-url representative)
     and (b) the PRIOR signature store (lsh_cross_candidate_pairs) — a
     doc estimated >= --est-jaccard against any prior doc is a near-dup
     of the corpus. Prior docs always win: the corpus is immutable here
  4. keep = fresh AND not exact-dup (either scope) AND not near-dup
     (either scope) AND the same base quality/length gates as the batch
     job
  5. outputs: <out>/curated (increment rows with provenance columns
     dup_of_prior / near_dup_prior) and <out>/signatures = prior store +
     increment signatures — the UPDATED store the NEXT increment bands
     against, so chains of increments stay O(increment) each

Scale shape: the prior corpus is touched only through its signature store
(one banded equi-join, shuffling (band, sig) keys) and its curated digest
column (one semi-join) — never its text. Signature determinism makes the
incremental invariant exact: store(prior) ∪ sig(increment) ==
sig(prior ∪ increment), verified by the test suite.

Policy gates (blocklist/cascade/perplexity) are deliberately absent here:
they are corpus-wide policies whose thresholds (percentile cuts, LM
statistics) must come from a full pass; apply them at the next batch
curation. This job's contract is the dedup frontier.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.operators import dedup as D
from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.plans.session import build_session


def curate_increment(
    spark,
    increment_path: str,
    prior_path: str,
    output_path: str,
    min_quality: float = 0.3,
    est_jaccard: float = 0.5,
):
    if os.path.abspath(output_path) == os.path.abspath(prior_path):
        # the updated store is WRITTEN while the prior store is still
        # being READ (lazy union) — in-place update would overwrite its
        # own input mid-scan. Write aside, then swap via table
        # maintenance, or point the next increment at the new root.
        raise ValueError("--output must differ from --prior (no in-place update)")
    prior_cur = spark.read.parquet(prior_path.rstrip("/") + "/curated")
    prior_sig = spark.read.parquet(prior_path.rstrip("/") + "/signatures")

    inc = spark.read.parquet(increment_path).select(
        "url", "extracted_text", "text_sha256", "url_bucket"
    )
    n_raw = inc.count()
    # (1) known urls are the merge pipeline's business
    inc = inc.join(prior_cur.select("url"), "url", "left_anti")

    text = F.col("extracted_text")
    stats = inc.select(
        "url",
        "text_sha256",
        "url_bucket",
        X.token_count(text).alias("n_tokens"),
        X.char_count(text).alias("n_chars"),
        X.quality_score(text).alias("quality"),
        X.lang_id(text).alias("pred_lang"),
        X.fingerprint(text, 4).alias("fingerprint"),
    )

    # (2) exact: within-increment canonical + vs prior KEPT digests
    canon = inc.groupBy("text_sha256").agg(
        F.min("url").alias("canonical_url")
    )
    prior_shas = prior_cur.where(F.col("keep")).select("text_sha256").distinct()
    dup_prior = (
        inc.join(prior_shas, "text_sha256", "left_semi")
        .select("url")
        .withColumn("dup_of_prior", F.lit(True))
    )

    # (3) near-dup: increment signatures, banded against themselves AND
    # the prior store. Written before use (same read-back reuse as the
    # batch job) because the relation feeds five join sides.
    sig_path = output_path.rstrip("/") + "/signatures"
    inc_sig_path = output_path.rstrip("/") + "/_inc_signatures"
    D.minhash_sig(
        D.doc_shingles(
            inc.select(F.col("url").alias("doc_id"), text.alias("text")),
            "doc_id", "text", 3, distinct=False,
        )
    ).write.mode("overwrite").parquet(inc_sig_path)
    inc_sig = spark.read.parquet(inc_sig_path)

    within = D.est_jaccard_pairs(
        D.lsh_candidate_pairs(inc_sig), inc_sig, inc_sig
    ).where(F.col("est_jaccard") >= est_jaccard)
    cross = D.est_jaccard_pairs(
        D.lsh_cross_candidate_pairs(inc_sig, prior_sig), inc_sig, prior_sig
    ).where(F.col("est_jaccard") >= est_jaccard)
    near_prior = (
        cross.select(F.col("doc_a").alias("url"))
        .distinct()
        .withColumn("near_dup_prior", F.lit(True))
    )
    comps = D.connected_components(within).select(
        F.col("doc_id").alias("url"),
        F.col("component").alias("near_dup_component"),
    )

    curated = (
        stats.join(canon, "text_sha256")
        .join(dup_prior, "url", "left")
        .join(near_prior, "url", "left")
        .join(comps, "url", "left")
        .withColumn("dup_of_prior", F.coalesce("dup_of_prior", F.lit(False)))
        .withColumn(
            "near_dup_prior", F.coalesce("near_dup_prior", F.lit(False))
        )
        .withColumn("is_exact_dup", F.col("url") != F.col("canonical_url"))
        .withColumn(
            "is_near_dup",
            F.col("near_dup_prior")
            | (
                F.col("near_dup_component").isNotNull()
                & (F.col("url") != F.col("near_dup_component"))
            ),
        )
        .withColumn(
            "keep",
            (~F.col("is_exact_dup"))
            & (~F.col("dup_of_prior"))
            & (~F.col("is_near_dup"))
            & (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= 5),
        )
    )

    curated_path = output_path.rstrip("/") + "/curated"
    (
        curated.repartition(F.col("url_bucket"))
        .write.mode("overwrite")
        .partitionBy("url_bucket")
        .parquet(curated_path)
    )

    # (5) updated signature store = prior ∪ increment (disjoint ids by
    # step 1, so unionByName is exact — the next increment bands against
    # this store and never rescans any text)
    prior_sig.unionByName(inc_sig).write.mode("overwrite").parquet(sig_path)
    import shutil

    shutil.rmtree(inc_sig_path, ignore_errors=True)

    out = spark.read.parquet(curated_path)
    return {
        "increment_docs": n_raw,
        "known_urls_skipped": n_raw - out.count(),
        "docs": out.count(),
        "kept": out.where("keep").count(),
        "exact_dups_within": out.where("is_exact_dup").count(),
        "exact_dups_vs_prior": out.where("dup_of_prior").count(),
        "near_dups_vs_prior": out.where("near_dup_prior").count(),
        "near_dup_docs": out.where(
            "near_dup_component IS NOT NULL AND url <> near_dup_component"
        ).count(),
        "curated_path": curated_path,
        "signatures_path": sig_path,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--increment", required=True,
                    help="new extracted table (the increment)")
    ap.add_argument("--prior", required=True,
                    help="prior curation OUTPUT root (holds curated/ and "
                         "signatures/)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--est-jaccard", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    spark = build_session("curate_increment", master=args.master)
    for p in (args.increment, args.prior):
        if not os.path.exists(p):
            print(f"error: path does not exist: {p}", file=sys.stderr)
            return 1
    report = curate_increment(
        spark, args.increment, args.prior, args.output,
        args.min_quality, args.est_jaccard,
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
