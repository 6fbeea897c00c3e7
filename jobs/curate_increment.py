#!/usr/bin/env python3
"""Incremental curation: dedup a NEW extraction increment against the
EXISTING curated corpus without rescanning prior text.

    spark-submit --py-files csp.zip jobs/curate_increment.py \
        --increment /data/out2/extracted --prior /data/curated \
        --output /data/curated_inc [--min-quality 0.3] [--est-jaccard 0.5]

The batch job (jobs/run_curation.py) persists three relations the
increment path needs: <prior>/frontier (compact url/digest/keep rows for
the WHOLE corpus so far), <prior>/signatures (the wide MinHash store) and
<prior>/curated. This job then:

  1. drops increment rows whose url already exists in the prior frontier
     (re-crawls of known urls are the MERGE pipeline's business —
     jobs/merge_increment.py replaces the row, and a later full curation
     re-scores it; curation increments are for NEW urls)
  2. exact dedup: within-increment sha groups (min-url canonical) AND
     vs prior — an increment doc whose text_sha256 matches any prior
     KEPT doc is a duplicate of the corpus (digest semi-join on the
     frontier)
  3. near-dup: increment signatures band-join (a) themselves (within-
     increment clusters -> connected components, min-url representative)
     and (b) the PRIOR signature store (lsh_cross_candidate_pairs) — a
     doc estimated >= --est-jaccard against any prior doc is a near-dup
     of the corpus. Prior docs always win: the corpus is immutable here
  4. exact-substring dedup (Lee et al.) over the increment's remaining
     keep-candidates — WITHIN-INCREMENT scope only: cross-corpus
     substring coverage would need prior text, which this job by
     contract never rescans; the next batch curation closes that gap
  5. keep = fresh AND not exact-dup (either scope) AND not near-dup
     (either scope) AND substring coverage <= --max-substring-dup AND
     the same base quality/length gates as the batch job. The curated
     output carries the batch table's export contract columns (split is
     the same pure url-hash, so increments land in consistent
     train/valid/test membership) — jobs/export_corpus.py runs on it
     unchanged. Corpus-wide POLICY gates (blocklist/cascade/perplexity)
     are deliberately absent: their thresholds (percentile cuts, LM
     statistics) must come from a full pass; apply them at the next
     batch curation.
  6. outputs under <out>: curated (increment rows with provenance
     columns dup_of_prior / near_dup_prior), signatures = prior store +
     increment signatures, frontier = prior frontier + increment rows —
     so the NEXT increment can point --prior here and still see EVERY
     url/digest back to the original batch; chains of increments stay
     O(increment + corpus-compact) each, never rescanning prior text

Scale shape: the prior corpus is touched only through its signature
store (one banded equi-join, shuffling (band, sig) keys) and its
frontier (two url/digest joins) — never its text. Signature determinism
makes the incremental invariant exact: store(prior) ∪ sig(increment) ==
sig(prior ∪ increment), verified by the test suite.
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
from corsearch_project_spark.sources.fs import LocalFS


def _read_frontier(spark, prior_path: str):
    """<prior>/frontier, or derived from <prior>/curated for pre-frontier
    batch outputs (same three columns either way)."""
    p = prior_path.rstrip("/") + "/frontier"
    if os.path.exists(p):
        return spark.read.parquet(p)
    return spark.read.parquet(prior_path.rstrip("/") + "/curated").select(
        "url", "text_sha256", "keep"
    )


def curate_increment(
    spark,
    increment_path: str,
    prior_path: str,
    output_path: str,
    min_quality: float = 0.3,
    est_jaccard: float = 0.5,
    max_substring_dup: float = 0.8,
    fs=LocalFS(),
):
    if os.path.abspath(output_path) == os.path.abspath(prior_path):
        # the updated store/frontier are WRITTEN while the prior ones are
        # still being READ (lazy unions) — in-place update would overwrite
        # its own input mid-scan. Write aside, then swap via table
        # maintenance, or point the next increment at the new root.
        raise ValueError("--output must differ from --prior (no in-place update)")
    frontier = _read_frontier(spark, prior_path)
    prior_sig = spark.read.parquet(prior_path.rstrip("/") + "/signatures")

    inc = spark.read.parquet(increment_path).select(
        "url", "extracted_text", "text_sha256", "url_bucket"
    )
    n_raw = inc.count()
    # (1) known urls are the merge pipeline's business — checked against
    # the FRONTIER (whole corpus), not just the previous increment
    inc = inc.join(frontier.select("url"), "url", "left_anti")

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
    prior_shas = frontier.where(F.col("keep")).select("text_sha256").distinct()
    dup_prior = (
        inc.join(prior_shas, "text_sha256", "left_semi")
        .select("url")
        .withColumn("dup_of_prior", F.lit(True))
    )

    # (3) near-dup: increment signatures, banded against themselves AND
    # the prior store. Written before use (same read-back reuse as the
    # batch job) because the relation feeds five join sides. The SAME
    # signature constructor as the batch job (dedup.signatures_for) —
    # the incremental == batch invariant holds only while both agree.
    sig_path = output_path.rstrip("/") + "/signatures"
    inc_sig_path = output_path.rstrip("/") + "/_inc_signatures"
    D.signatures_for(inc).write.mode("overwrite").parquet(inc_sig_path)
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
    deg = (
        within.select(F.explode(F.array("doc_a", "doc_b")).alias("url"))
        .unionByName(cross.select(F.col("doc_a").alias("url")))
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("near_dup_degree"))
    )

    curated = (
        stats.join(canon, "text_sha256")
        .join(dup_prior, "url", "left")
        .join(near_prior, "url", "left")
        .join(comps, "url", "left")
        .join(deg, "url", "left")
        .withColumn("dup_of_prior", F.coalesce("dup_of_prior", F.lit(False)))
        .withColumn(
            "near_dup_prior", F.coalesce("near_dup_prior", F.lit(False))
        )
        .withColumn("near_dup_degree", F.coalesce("near_dup_degree", F.lit(0)))
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
            "base_keep",
            (~F.col("is_exact_dup"))
            & (~F.col("dup_of_prior"))
            & (~F.col("is_near_dup"))
            & (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= 5),
        )
    )

    # (4) substring gate over the increment's keep-candidates — the same
    # survivor-only discipline as the batch job, within-increment scope
    cand = curated.where("base_keep").select("url")
    sub = D.substring_dup_stats(
        inc.join(cand, "url", "left_semi").select(
            F.col("url").alias("doc_id"),
            F.col("extracted_text").alias("text"),
        ),
        id_col="doc_id",
        text_col="text",
    ).select(
        F.col("doc_id").alias("url"),
        F.col("dup_fraction").alias("substring_dup_fraction"),
    )
    curated = (
        curated.join(sub, "url", "left")
        .withColumn(
            "keep",
            F.col("base_keep")
            & (F.coalesce("substring_dup_fraction", F.lit(0.0))
               <= max_substring_dup),
        )
        .drop("base_keep")
        # same pure url-hash as the batch job: an url's split membership
        # never depends on which pass curated it
        .withColumn("split", X.hash_split(F.col("url")))
    )

    curated_path = output_path.rstrip("/") + "/curated"
    (
        curated.repartition(F.col("url_bucket"))
        .write.mode("overwrite")
        .partitionBy("url_bucket")
        .parquet(curated_path)
    )

    # (6) updated store + frontier = prior ∪ increment (disjoint ids by
    # step 1, so unionByName is exact)
    prior_sig.unionByName(inc_sig).write.mode("overwrite").parquet(sig_path)
    out = spark.read.parquet(curated_path)
    frontier.unionByName(
        out.select("url", "text_sha256", "keep")
    ).write.mode("overwrite").parquet(output_path.rstrip("/") + "/frontier")
    # driver-side cleanup through the FS seam (sources/fs.py): a plain
    # shutil.rmtree would silently no-op on object-store/HDFS roots
    fs.rmtree(inc_sig_path)

    n_docs = out.count()
    return {
        "increment_docs": n_raw,
        "known_urls_skipped": n_raw - n_docs,
        "docs": n_docs,
        "kept": out.where("keep").count(),
        "exact_dups_within": out.where("is_exact_dup").count(),
        "exact_dups_vs_prior": out.where("dup_of_prior").count(),
        "near_dups_vs_prior": out.where("near_dup_prior").count(),
        "near_dup_docs": out.where(
            "near_dup_component IS NOT NULL AND url <> near_dup_component"
        ).count(),
        "substring_dup_dropped": out.where(
            f"substring_dup_fraction > {max_substring_dup}"
        ).count(),
        "curated_path": curated_path,
        "signatures_path": sig_path,
        "frontier_path": output_path.rstrip("/") + "/frontier",
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--increment", required=True,
                    help="new extracted table (the increment)")
    ap.add_argument("--prior", required=True,
                    help="prior curation OUTPUT root (holds curated/, "
                         "signatures/ and frontier/)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--est-jaccard", type=float, default=0.5)
    ap.add_argument("--max-substring-dup", type=float, default=0.8)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    spark = build_session("curate_increment", master=args.master)
    for p in (args.increment, args.prior):
        if not os.path.exists(p):
            print(f"error: path does not exist: {p}", file=sys.stderr)
            return 1
    report = curate_increment(
        spark, args.increment, args.prior, args.output,
        args.min_quality, args.est_jaccard, args.max_substring_dup,
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
