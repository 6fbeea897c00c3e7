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


# ---------------------------------------------------------------------------
# Distributed training (round-4 cont.): learn the bucket table the deployed
# scorer reads, instead of the hash-derived stand-in above.
# ---------------------------------------------------------------------------

N_BUCKETS = 4096


def bucket_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str | None = None,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Sparse hashed-feature relation ``(id[, label], bucket, cnt)`` —
    explode + partial-agg count, ONE shuffle. bucket = pmod(phash(feat),
    n_buckets): the SAME bucketing the deployed JVM scorer uses, so a
    model trained here drops into ``trained_score_expr`` with no vocab
    translation step (train/serve skew is impossible by construction)."""
    keep = [id_col] + ([label_col] if label_col else [])
    ex = df.select(
        *keep, F.explode(doc_features(F.col(text_col))).alias("feat")
    ).select(
        *keep,
        F.pmod(phash(F.col("feat")), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    return ex.groupBy(*keep, "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )


def train_quality_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = N_BUCKETS,
    max_iter: int = 60,
    reg_param: float = 1e-4,
):
    """fastText-architecture quality classifier, trained DISTRIBUTED:
    hashed unigram+bigram counts -> MLlib LogisticRegression (driver-side
    L-BFGS over executor-aggregated gradients — the canonical Spark
    training shape; each iteration is one treeAggregate over the cached
    training relation). Returns ``(weights list[n_buckets], intercept)``.

    Training runs on the LABELED subsample (CCNet/GPT-3 train on 10^5–10^7
    docs), so the per-doc densify stage is fine; the 10^12-doc pass is the
    SCORING side, which stays a pure-JVM projection
    (``trained_score_expr``). Vector assembly crosses into Python once via
    mapInPandas (Arrow-batched) because VectorUDT is not Arrow-expressible;
    the hand-off back to the JVM uses pyspark.ml.functions.array_to_vector."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    grouped = (
        bucket_counts(df, id_col, text_col, label_col, n_buckets)
        .groupBy(id_col, label_col)
        .agg(
            F.collect_list("bucket").alias("idx"),
            F.collect_list("cnt").alias("val"),
        )
    )

    def densify(batches):
        import numpy as np

        for pdf in batches:
            arrs = []
            for idx, val in zip(pdf["idx"], pdf["val"]):
                a = np.zeros(n_buckets, dtype=np.float64)
                a[np.asarray(idx, dtype=np.int64)] = np.asarray(val)
                arrs.append(list(a))
            yield pdf.assign(arr=arrs)[[label_col, "arr"]]

    dense = grouped.mapInPandas(
        densify, schema=f"{label_col} double, arr array<double>"
    )
    train = dense.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector("arr").alias("features"),
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    ).fit(train)
    return model.coefficients.toArray().tolist(), float(model.intercept)


def trained_score_expr(
    text: Column,
    weights,
    intercept: float = 0.0,
    n_buckets: int = N_BUCKETS,
) -> Column:
    """Margin of the TRAINED model as one pure-JVM Column — the drop-in
    the module docstring promised: weight lookup is
    element_at(<array literal>, bucket + 1). The table ships as a SINGLE
    ArrayType literal (~32 KB at 4096 buckets — one plan constant, not
    4096 expression nodes, so Janino never sees it), and the fold is the
    same zero-shuffle F.aggregate shape as score_expr. margin > 0 is the
    keep decision; apply F.sigmoid for a probability."""
    w = F.lit([float(x) for x in weights])
    feats = doc_features(text)
    raw = F.aggregate(
        feats,
        F.lit(float(intercept)).cast("double"),
        lambda acc, x: acc
        + F.element_at(w, F.pmod(phash(x), F.lit(n_buckets)).cast("int") + 1),
    )
    return raw
