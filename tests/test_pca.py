"""Distributed PCA (operators/pca.py): sufficient statistics exactness,
driver-side eigh finish, broadcast projection, and the plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from corsearch_project_spark.operators.pca import (
    embedding_stats,
    pca_components,
    pca_project,
)

DIM = 8


def _fixture(spark, n=40, dim=DIM, seed=7):
    rng = np.random.RandomState(seed)
    # low-rank + noise so the spectrum has structure
    base = rng.randn(n, 3) @ rng.randn(3, dim)
    x = (base + 0.05 * rng.randn(n, dim)).astype(np.float64)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        x,
    )


def _quant(x):
    v = np.asarray(x, dtype=np.float32).astype(np.float64) * 1000.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def test_stats_match_numpy_exactly(spark):
    df, x = _fixture(spark)
    q = _quant(x)
    got = {(r["i"], r["j"]): r["value"] for r in embedding_stats(df, dim=DIM).collect()}
    g = q.T @ q
    for i in range(DIM):
        for j in range(i, DIM):
            assert got[(i, j)] == g[i, j], (i, j)
        assert got[(i, -1)] == q[:, i].sum()
    assert got[(-1, -1)] == len(q)
    # exactly the expected key count: d(d+1)/2 + d + 1
    assert len(got) == DIM * (DIM + 1) // 2 + DIM + 1


def test_stats_partitioning_invariance(spark):
    """The integer sums cannot depend on batch/partition boundaries."""
    df, _ = _fixture(spark, n=64)
    a = {(r["i"], r["j"]): r["value"]
         for r in embedding_stats(df.repartition(1), dim=DIM).collect()}
    b = {(r["i"], r["j"]): r["value"]
         for r in embedding_stats(df.repartition(13), dim=DIM).collect()}
    assert a == b


def test_components_match_numpy_eigh(spark):
    df, x = _fixture(spark)
    q = _quant(x).astype(np.float64)
    comps, evals, mean = pca_components(embedding_stats(df, dim=DIM), dim=DIM, k=3)
    ref_cov = np.cov(q, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(ref_cov)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(evals, w[order], rtol=1e-9)
    assert np.allclose(mean, q.mean(axis=0), rtol=1e-12)
    for c in range(3):
        ref = v[:, order[c]]
        # sign-fixed: compare up to the convention applied in pca_components
        if ref[np.abs(ref).argmax()] < 0:
            ref = -ref
        assert np.allclose(comps[:, c], ref, rtol=1e-8), c
        # convention holds: largest-|coeff| entry is positive
        assert comps[np.abs(comps[:, c]).argmax(), c] > 0


def test_projection_matches_reference_and_variance(spark):
    df, x = _fixture(spark, n=60)
    q = _quant(x).astype(np.float64)
    stats = embedding_stats(df, dim=DIM)
    comps, evals, mean = pca_components(stats, dim=DIM, k=3)
    got = {r["vec_id"]: np.array(r["projected"])
           for r in pca_project(df, comps, mean).collect()}
    ref = (q - q.mean(axis=0)) @ comps
    for i in range(60):
        assert np.allclose(got[i], ref[i], rtol=1e-9), i
    # per-dimension sample variance of the projection equals the eigenvalue
    proj = np.stack([got[i] for i in range(60)])
    assert np.allclose(proj.var(axis=0, ddof=1), evals, rtol=1e-9)
    # decorrelation: off-diagonal covariance ~ 0 relative to the spectrum
    c = np.cov(proj, rowvar=False, ddof=1)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-6 * evals[0]


def test_small_input_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * DIM)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        pca_components(embedding_stats(df, dim=DIM), dim=DIM)


def test_stats_plan_one_python_stage_one_shuffle(spark):
    df, _ = _fixture(spark)
    plan = (
        embedding_stats(df, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1
    # partial/final hash agg around exactly one exchange
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan or "partial" in plan.lower()
