"""Hashed linear quality classifier (operators/classifier.py).

The registry-wide parity gate cross-checks q_quality_classifier against
DuckDB; this file pins the construction on hand inputs (weight formula vs
an independent Python md5, bigram features, empty text) and the plan shape
(single projection: no shuffle, no Python stage).
"""

import hashlib

from pyspark.sql import functions as F

from corsearch_project_spark.operators import classifier as C


def _py_weight(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % 2001 - 1000


def _py_score_raw(text: str) -> int:
    w = text.strip().split(" ")
    feats = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
    return sum(_py_weight(f) for f in feats)


def test_classify_matches_independent_python_md5(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spam spam spam buy now",
        "x",
        "",  # split(trim('')) -> [''] : one degenerate feature
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in C.classify(df).collect()}
    for i, s in enumerate(texts):
        w = s.strip().split(" ")
        n_feats = len(w) + max(len(w) - 1, 0)
        raw = _py_score_raw(s)
        r = got[i]
        assert (r["n_feats"], r["score_raw"]) == (n_feats, raw), s
        assert r["keep"] == (raw > 0)
        assert abs(r["score"] - round(raw / (max(n_feats, 1) * 1000.0), 6)) < 1e-12


def test_classify_is_single_projection(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word soup number "), F.col("id").cast("string")).alias("text"),
    )
    plan = C.classify(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


def _labeled_corpus(n_pos=120, n_neg=120, seed=5):
    """Two overlapping vocabularies: 'wiki-like' positives vs 'spam-like'
    negatives sharing a common word pool, so the task is separable but not
    trivially so."""
    import random

    rng = random.Random(seed)
    common = ["the", "and", "of", "page", "data", "report"]
    pos_v = ["science", "history", "museum", "archive", "research",
             "culture", "journal", "library"]
    neg_v = ["casino", "pills", "winner", "click", "bonus", "cheap",
             "offer", "deal"]
    rows = []
    for i in range(n_pos + n_neg):
        pos = i < n_pos
        v = pos_v if pos else neg_v
        words = [rng.choice(v if rng.random() < 0.6 else common)
                 for _ in range(rng.randint(12, 30))]
        rows.append((i, " ".join(words), 1.0 if pos else 0.0))
    rng.shuffle(rows)
    return rows


def test_trained_model_separates_and_deploys_to_jvm_scorer(spark):
    rows = _labeled_corpus()
    train_rows, hold_rows = rows[:200], rows[200:]
    train = spark.createDataFrame(
        train_rows, "doc_id long, text string, label double"
    )
    hold = spark.createDataFrame(
        hold_rows, "doc_id long, text string, label double"
    )
    w, b = C.train_quality_weights(train, max_iter=40)
    assert len(w) == C.N_BUCKETS
    scored = hold.select(
        "doc_id", "label",
        C.trained_score_expr(F.col("text"), w, b).alias("margin"),
    )
    got = scored.collect()
    acc = sum(1 for r in got if (r["margin"] > 0) == (r["label"] > 0.5)) / len(got)
    assert acc >= 0.95, acc


def test_trained_jvm_margin_matches_mllib_dot_product(spark):
    """The deployed JVM fold (Σ_occurrences w[bucket] + intercept) must
    equal the MLlib model's dot(counts, coeffs) + intercept — train/serve
    parity, the thing the shared phash bucketing exists to guarantee."""
    import numpy as np

    rows = _labeled_corpus(40, 40, seed=9)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    w, b = C.train_quality_weights(df, max_iter=25)
    jvm = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", C.trained_score_expr(F.col("text"), w, b).alias("m")
        ).collect()
    }
    counts = C.bucket_counts(df, label_col=None).collect()
    ref = {}
    for r in counts:
        ref[r["doc_id"]] = ref.get(r["doc_id"], 0.0) + r["cnt"] * w[r["bucket"]]
    for did, m in jvm.items():
        assert np.isclose(m, ref.get(did, 0.0) + b, rtol=1e-9, atol=1e-9), did


def test_trained_inference_plan_is_pure_jvm(spark):
    rows = _labeled_corpus(10, 10, seed=3)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    w = [0.5] * C.N_BUCKETS
    plan = (
        df.select(C.trained_score_expr(F.col("text"), w, 0.1).alias("m"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, marker
    # the weight table must reach the plan as ONE Literal (printed as
    # [0.5, 0.5, ...]), never a CreateArray of 4096 child expressions
    # (printed as array(0.5, 0.5, ...)) — Janino sees a single constant
    assert "array(0.5" not in plan
    assert "[0.5,0.5" in plan


def test_training_repartition_stability(spark):
    rows = _labeled_corpus(60, 60, seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    import numpy as np

    w1, b1 = C.train_quality_weights(df.repartition(2), max_iter=30)
    w2, b2 = C.train_quality_weights(df.repartition(7), max_iter=30)
    assert np.allclose(w1, w2, atol=1e-4)
    assert abs(b1 - b2) < 1e-4
