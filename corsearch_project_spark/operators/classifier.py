"""Model-based quality filtering — a fastText-style hashed linear
classifier, pure JVM.

Modern curation pipelines (CCNet, GPT-3, LLaMA) follow the heuristic
filters with a MODEL-based quality score: a linear classifier over hashed
word n-gram features (fastText's architecture) trained wiki-vs-crawl. The
scale-relevant shape is the hashing trick: a feature's weight index is a
pure hash of the token, so scoring needs NO vocabulary lookup table at all
— every document scores itself inside a narrow projection, zero shuffle,
zero Python, which is exactly how a 10^12-doc scoring pass must run (a
broadcast vocab table would work too, but the hashed form doesn't even pay
the broadcast).

Weights here are derived directly from the portable hash (uniform in
[-WEIGHT_SPAN, +WEIGHT_SPAN]) — standing in for a trained model's bucket
table. A real fastText model drops in by replacing ``feature_weight`` with
``element_at(broadcast_weight_array, phash(x) % n_buckets)``; nothing else
in the plan changes. Integer weights keep the document score an exact
BIGINT sum, so the DuckDB oracle twin (same hash, same arithmetic) is
bit-identical regardless of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from corsearch_project_spark.functions.portable import phash
from corsearch_project_spark.operators.dedup import word_shingles, words

# Weights live in [-WEIGHT_SPAN, +WEIGHT_SPAN]; the final score divides by
# WEIGHT_SPAN so it lands in ~[-1, 1] like a margin.
WEIGHT_SPAN = 1000


def feature_weight(feat: Column) -> Column:
    """Integer weight of one feature: uniform in [-1000, 1000] as a pure
    function of the portable 32-bit hash (the hashing trick — no vocab)."""
    return (phash(feat) % (2 * WEIGHT_SPAN + 1)) - WEIGHT_SPAN


def doc_features(text: Column) -> Column:
    """Unigrams + space-joined bigrams — fastText's default feature set
    (wordNgrams=2). Both pieces are existing shared primitives with DuckDB
    byte-compatible twins."""
    return F.concat(words(text), word_shingles(text, 2))


def score_expr(text: Column) -> Column:
    """Normalized model score (~[-1, 1] margin) as a single Column — for
    embedding the classifier into a wider projection (e.g. the curation
    job) without the classify() column contract."""
    feats = doc_features(text)
    raw = F.aggregate(
        feats, F.lit(0).cast("long"), lambda acc, x: acc + feature_weight(x)
    )
    return F.round(
        raw.cast("double")
        / (F.greatest(F.size(feats), F.lit(1)).cast("double") * float(WEIGHT_SPAN)),
        6,
    )


def classify(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_feats, score_raw, score, keep) for every document.

    score_raw = SUM of integer feature weights, folded with F.aggregate
    directly over the feature array — the whole scorer is one projection:
    no explode, no groupBy, no shuffle, no Python stage (plan-gated in
    tests/test_classifier.py). score normalizes by n_feats * WEIGHT_SPAN
    (one double division at the end, same operand order as the oracle);
    keep is the sign — the margin threshold a deployment would tune.
    """
    feats = doc_features(F.col(text_col))
    score_raw = F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda acc, x: acc + feature_weight(x),
    )
    out = df.select(
        id_col,
        F.size(feats).cast("long").alias("n_feats"),
        score_raw.alias("score_raw"),
    )
    return out.select(
        id_col,
        "n_feats",
        "score_raw",
        F.round(
            F.col("score_raw").cast("double")
            / (
                F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
                * float(WEIGHT_SPAN)
            ),
            6,
        ).alias("score"),
        (F.col("score_raw") > 0).alias("keep"),
    )
