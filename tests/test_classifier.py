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
