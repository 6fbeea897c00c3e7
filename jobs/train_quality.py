#!/usr/bin/env python3
"""Train the model-based quality classifier (CCNet/GPT-3 recipe): positive
examples from a trusted corpus (wiki-like), negatives from raw crawl, both
as extracted tables; hashed unigram+bigram features over the SAME phash
buckets the pure-JVM scorer reads (operators/classifier.py), MLlib
LogisticRegression for the distributed fit.

Output is a weights JSON ``{n_buckets, weights, intercept, report...}``
that ``run_curation --model-weights`` loads to replace the hash-derived
stand-in margin with the trained one and gate keep on
``--min-model-score``.

    spark-submit --py-files csp.zip jobs/train_quality.py \
        --positive /data/wiki/extracted --negative /data/crawl/extracted \
        --output /data/quality_weights.json

Scale note: training runs on a bounded labeled subsample
(--max-per-class, CCNet trains on 10^5-10^7 docs) — the unbounded side is
SCORING, which stays a zero-shuffle JVM projection. The holdout split is
the reproducible portable-hash split (textstats.hash_split), so reruns
report the same accuracy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.operators import classifier as C
from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.plans.session import build_session


def _load_side(spark, path: str, label: float, cap: int, text_col: str):
    df = spark.read.parquet(path).select(
        F.col("url"), F.col(text_col).alias("text")
    )
    # deterministic cap: order-free hash-band filter, not a sample()
    # (seeded sample is partitioning-dependent). phash is uniform over
    # [0, 2^32), so keeping hashes below floor(2^32 * cap/n) keeps ~cap
    # rows for ANY n — including n > 2^32, where a pmod(hash, n) band
    # degenerates to the identity (pmod(h, n) == h) and a floor-division
    # modulus kept up to ~2x cap when cap < n < 2*cap. Exact count is not
    # needed; balance is reported.
    if cap:
        n = df.count()
        if n > cap:
            from corsearch_project_spark.functions.portable import phash

            threshold = max((cap * (1 << 32)) // n, 1)
            df = df.where(phash(F.col("url")) < F.lit(threshold))
    return df.select("url", "text", F.lit(label).alias("label"))


def train_quality(
    spark,
    positive: str,
    negative: str,
    output: str,
    text_col: str = "extracted_text",
    max_per_class: int = 100_000,
    max_iter: int = 60,
    reg_param: float = 1e-4,
    holdout_pct: int = 10,
) -> dict:
    pos = _load_side(spark, positive, 1.0, max_per_class, text_col)
    neg = _load_side(spark, negative, 0.0, max_per_class, text_col)
    labeled = pos.unionByName(neg).select(
        "url", "text", "label", X.hash_split(F.col("url"), 100 - holdout_pct, 0).alias("split")
    )
    train = labeled.where(F.col("split") == "train").persist()
    hold = labeled.where(F.col("split") != "train")
    n_train = train.count()
    if n_train < 4:
        raise ValueError(f"not enough training rows ({n_train})")
    w, b = C.train_quality_weights(
        train,
        id_col="url",
        text_col="text",
        label_col="label",
        max_iter=max_iter,
        reg_param=reg_param,
    )
    scored = hold.select(
        "label", C.trained_score_expr(F.col("text"), w, b).alias("m")
    )
    agg = scored.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("m") > 0) == (F.col("label") > 0.5)).cast("long")
        ).alias("ok"),
    ).collect()[0]
    train.unpersist()
    report = {
        "n_buckets": C.N_BUCKETS,
        "n_train": n_train,
        "n_holdout": int(agg["n"]),
        "holdout_accuracy": round(agg["ok"] / agg["n"], 4) if agg["n"] else None,
        "intercept": b,
        "output": output,
    }
    with open(output, "w") as f:
        json.dump({"n_buckets": C.N_BUCKETS, "weights": w, "intercept": b,
                   "report": {k: v for k, v in report.items() if k != "output"}}, f)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--positive", required=True,
                    help="extracted table of trusted (label=1) docs")
    ap.add_argument("--negative", required=True,
                    help="extracted table of raw-crawl (label=0) docs")
    ap.add_argument("--output", required=True, help="weights JSON path")
    ap.add_argument("--text-col", default="extracted_text")
    ap.add_argument("--max-per-class", type=int, default=100_000)
    ap.add_argument("--max-iter", type=int, default=60)
    ap.add_argument("--reg-param", type=float, default=1e-4)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    for p in (args.positive, args.negative):
        if not os.path.exists(p):
            print(f"error: input path does not exist: {p}", file=sys.stderr)
            return 1
    spark = build_session("train_quality", master=args.master)
    report = train_quality(
        spark, args.positive, args.negative, args.output,
        text_col=args.text_col, max_per_class=args.max_per_class,
        max_iter=args.max_iter, reg_param=args.reg_param,
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
