"""Bigram language-model scoring — the CCNet-style perplexity filter.

The curation stage between heuristic rules and model-based classifiers in a
web-scale training pipeline (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020): train a small LM on a
trusted slice, score every document by per-token negative log-likelihood,
and bucket the corpus into head / middle / tail terciles. The head bucket is
what a pretraining mixture keeps at full weight.

Spark shape (all JVM Column programs, no Python on any path):

  * training counts — one explode of the train slice's word bigrams feeding
    two partial-aggregated ``groupBy`` counts (bigram ``c12``, head ``c1``)
    plus a one-row distinct-unigram vocabulary scalar. At 10^12 docs the
    bigram table is large but linear in corpus size and shuffles once.
  * scoring — the corpus's bigrams left-join the count tables (sort-merge on
    the bigram string at scale; the head table is the smaller side), fold
    per-term surprisal, and aggregate per doc (one shuffle, partial-agg).
  * bucketing — an unpartitioned ntile(3) gives the exact CCNet terciles;
    a global sort is the correct *test-scale* oracle surface, and the
    docstring seam for 10^12 docs is two broadcast quantile thresholds from
    ``percentile_approx`` (rank-free, no global sort), same bucket column.

Cross-engine exactness (queries/base.py rules): all counts are BIGINTs; the
only float op is ``-ln((c12+1)/(c1+V))`` evaluated on bit-identical double
operands in both engines, immediately quantized to integer micro-nats
(``round(x * 1e6)`` → BIGINT) so per-doc sums are order-independent integer
arithmetic — no double accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from corsearch_project_spark.operators.dedup import word_shingles, words
from corsearch_project_spark.operators.textstats import hash_split

MICRO = 1_000_000.0  # surprisal fixed-point scale (micro-nats)


def train_slice(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The trusted slice the LM trains on: the deterministic 'train' hash
    split — a pure function of the key, so retraining on an incremented
    corpus sees a superset, never a reshuffle."""
    return docs.where(hash_split(F.col(id_col).cast("string")) == "train")


def bigram_counts(train: DataFrame, text_col: str = "text"):
    """(bigram c12 table, head c1 table, one-row vocab scalar V).

    One explode serves both counts; Catalyst reuses the shingle projection.
    V is |distinct unigrams| in the train slice — the add-one smoothing
    denominator extension.
    """
    grams = train.select(
        F.explode(word_shingles(F.col(text_col), 2)).alias("g")
    )
    c12 = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c12"))
    c1 = grams.groupBy(
        F.substring_index(F.col("g"), " ", 1).alias("h")
    ).agg(F.count(F.lit(1)).alias("c1"))
    vocab = train.select(
        F.explode(words(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    return c12, c1, vocab


def score_nll(
    docs: DataFrame,
    c12: DataFrame,
    c1: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc add-one bigram NLL in integer micro-nats.

    p(w2|w1) = (c12+1) / (c1+V); per-term surprisal is quantized to a
    BIGINT immediately after the single ``ln``, so the per-doc sum is exact
    integer arithmetic — partial/final aggregation order cannot change it.
    Docs with fewer than two tokens have no bigrams and drop out (the
    contract corpus minimum is 10 tokens).
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), 2)).alias("g"),
    ).withColumn("h", F.substring_index(F.col("g"), " ", 1))
    j = (
        grams.join(c12, "g", "left")
        .join(c1, "h", "left")
        .crossJoin(F.broadcast(vocab))
    )
    num = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).cast("double")
    den = (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
    term_u = F.round(-F.log(num / den) * F.lit(MICRO), 0).cast("long")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(term_u).alias("nll_micro"),
    )


def perplexity_buckets(
    scored: DataFrame, id_col: str = "doc_id", mode: str = "ntile"
) -> DataFrame:
    """Attach ``avg_nll`` (nats/bigram, 6 dp) and the CCNet tercile bucket.

    Two physical strategies for the same column:

      * ``mode="ntile"`` — exact rank terciles via an unpartitioned
        window. The oracle surface (bit-deterministic with the doc_id
        tie-break), but it funnels all rows through one partition: test
        scale only.
      * ``mode="threshold"`` — the 10^12-doc path: two
        ``percentile_approx`` cut points reduced to ONE scalar row and
        broadcast back; no global sort, no single-partition stage,
        identical bucket semantics up to ties at the cut values.
    """
    avg = F.round(
        F.col("nll_micro").cast("double")
        / (F.col("n_bigrams").cast("double") * F.lit(MICRO)),
        6,
    )
    scored = scored.withColumn("avg_nll", avg)
    if mode == "threshold":
        cuts = scored.agg(
            F.percentile_approx("avg_nll", 1.0 / 3, 10_000).alias("c1"),
            F.percentile_approx("avg_nll", 2.0 / 3, 10_000).alias("c2"),
        )
        return scored.crossJoin(F.broadcast(cuts)).withColumn(
            "ppl_bucket",
            F.when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
            .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        ).drop("c1", "c2")
    w = Window.orderBy(F.col("avg_nll"), F.col(id_col))
    tile = F.ntile(3).over(w)
    return scored.withColumn(
        "ppl_bucket",
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ntile",
) -> DataFrame:
    """End-to-end CCNet filter: train on the hash-split slice, score all."""
    c12, c1, vocab = bigram_counts(train_slice(docs, id_col), text_col)
    scored = score_nll(docs, c12, c1, vocab, id_col, text_col)
    return perplexity_buckets(scored, id_col, mode=mode).select(
        id_col, "n_bigrams", "nll_micro", "avg_nll", "ppl_bucket"
    )


# ----------------------------------------- DSIR importance resampling

DSIR_BUCKETS = 4096  # hashed n-gram feature space (paper uses 10k)


def hashed_features(text_col, m: int = DSIR_BUCKETS):
    """Array of hashed unigram+bigram feature bucket ids — the DSIR
    feature space (Xie et al., "Data Selection for Language Models via
    Importance Resampling", NeurIPS 2023): the hashing trick makes the
    bag-of-ngrams models vocabulary-free and the per-bucket tables
    broadcastable (m rows, never corpus-sized)."""
    from pyspark.sql import functions as F
    from corsearch_project_spark.functions.portable import phash

    feats = F.concat(words(text_col), word_shingles(text_col, 2))
    return F.transform(feats, lambda g: phash(g) % m)


def dsir_weights(
    docs: DataFrame,
    target_pred,
    m: int = DSIR_BUCKETS,
    top_k: int = 125,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc DSIR log importance weights + top-k selection flag.

    Fits two add-one-smoothed bag-of-hashed-ngrams models — the target
    slice (``target_pred`` rows) and the full raw corpus — and scores every
    document by

        log w(x) = Σ_f  [ ln p̂_target(f) − ln p̂_raw(f) ]

    the log importance ratio under the bucket unigram models. Spark shape:
    two explode→partial-agg bucket counts (each ≤ m rows after the map-side
    combine, so shuffle volume is #tasks·m regardless of corpus size), the
    λ table joined bucket-wise and BROADCAST onto the corpus's exploded
    features (no shuffle to score), one per-doc agg. Per-bucket λ is
    quantized to integer micro-nats immediately after the two lns, so doc
    sums are exact order-free BIGINTs (same discipline as score_nll).

    ``selected`` marks the top_k docs by mean per-feature weight (length
    normalization — raw Σ rewards long docs); the oracle surface is an
    exact row_number, the 10^12-doc seam is a broadcast quantile threshold,
    same column.
    """
    from pyspark.sql import Window

    feats = docs.select(
        F.col(id_col), F.explode(hashed_features(F.col(text_col), m)).alias("b")
    )
    tgt = docs.where(target_pred).select(
        F.explode(hashed_features(F.col(text_col), m)).alias("b")
    )
    t_counts = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("t_b"))
    r_counts = feats.groupBy("b").agg(F.count(F.lit(1)).alias("r_b"))
    totals = r_counts.agg(F.sum("r_b").alias("r_tot")).crossJoin(
        t_counts.agg(F.sum("t_b").alias("t_tot"))
    )
    lam = (
        r_counts.join(t_counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("t_b"), F.lit(0)) + F.lit(1)).cast("double")
                        / (F.col("t_tot") + F.lit(m)).cast("double")
                    )
                    - F.log(
                        (F.col("r_b") + F.lit(1)).cast("double")
                        / (F.col("r_tot") + F.lit(m)).cast("double")
                    )
                )
                * F.lit(MICRO),
                0,
            )
            .cast("long")
            .alias("lam_u"),
        )
    )
    scored = (
        feats.join(F.broadcast(lam), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lam_u").alias("logw_micro"),
        )
        .withColumn(
            "avg_logw",
            F.round(
                F.col("logw_micro").cast("double")
                / (F.col("n_feats").cast("double") * F.lit(MICRO)),
                6,
            ),
        )
    )
    rn = F.row_number().over(
        Window.orderBy(F.desc("avg_logw"), F.col(id_col))
    )
    return scored.withColumn("selected", rn <= top_k)
