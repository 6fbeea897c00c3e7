"""Plan-equivalence gates for the scale-path dedup operators: the banded
(linear-shuffle) plans must produce exactly the relation the quadratic
control plans produce — recall guarantees, not heuristics."""

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import dedup as D
from conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_simhash_banding_equals_exact(spark):
    """Pigeonhole guarantee: chunk-banded candidate join loses no pair
    within Hamming <= 3 of 32 bits (4 chunks => >=1 exact-match chunk)."""
    sims = D.simhash(_docs(spark), "doc_id", "text")
    banded = {tuple(r) for r in D.simhash_pairs(sims, max_hamming=3).collect()}
    exact = {
        tuple(r) for r in D.simhash_pairs(sims, max_hamming=3, exact_plan=True).collect()
    }
    assert banded == exact
    assert exact, "fixture should contain at least one near-dup pair"


def test_simhash_candidates_superset_and_bounded(spark):
    """Candidates from banding are a superset of true pairs and never
    include a pair that agrees on no chunk."""
    sims = D.simhash(_docs(spark), "doc_id", "text")
    cands = D.simhash_candidates(sims, max_hamming=3)
    n_true = (
        cands.withColumn("h", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("h") <= 3)
        .count()
    )
    assert cands.count() >= n_true


def test_simhash_plan_has_no_cartesian(spark):
    """The default pair plan must be an equi-join (shuffled/broadcast hash),
    never BroadcastNestedLoop/Cartesian — that is the 10^12-doc property."""
    sims = D.simhash(_docs(spark), "doc_id", "text")
    plan = D.simhash_pairs(sims)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_cells_total_and_unique(spark):
    """IVF coarse quantization: every vector lands in exactly one cell, and
    every cell id is a centroid id (vec_id % stride == 0)."""
    from corsearch_project_spark.operators import simsearch as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cells = S.ivf_cells(emb)
    n = emb.count()
    assert cells.count() == n
    assert cells.select("vec_id").distinct().count() == n
    bad = cells.where((F.col("cell") % S.IVF_STRIDE) != 0).count()
    assert bad == 0


def test_ivf_probe_plan_is_broadcast_only(spark):
    """The IVF search must never shuffle the big side: centroids, probe set
    and query vector are broadcast; no SortMergeJoin/ShuffledHashJoin."""
    from corsearch_project_spark.operators import simsearch as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plan = S.ivf_topk(emb, 7)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_connected_components_chain_and_cliques(spark):
    """Label propagation must converge on a long chain (worst diameter) and
    merge separate cliques correctly."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component"] for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_log_rounds_on_long_chain(spark):
    """Pointer-jump shortcutting must converge a 300-hop chain well inside
    the default 20-round budget (plain O(diameter) propagation would need
    300 rounds and raise); labels cross-checked against union-find."""
    import random as _random

    edges = [(i, i + 1) for i in range(300)]
    # a few extra random edges so the graph isn't purely a path
    r = _random.Random(5)
    extra = [(r.randrange(0, 280), r.randrange(0, 280) + 1) for _ in range(20)]
    all_edges = edges + [(a, b) for a, b in extra if a != b]
    pairs = spark.createDataFrame(all_edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in D.connected_components(pairs, max_iter=20).collect()
    }

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in all_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert got == want


def test_connected_components_raises_on_round_exhaustion(spark):
    """Exhausting max_iter without a fixed point must raise, never return
    silently-wrong labels (ADVICE r1: unconverged exit corrupts the
    downstream keep-filter)."""
    edges = [(i, i + 1) for i in range(64)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iter=2)


def test_connected_components_reliable_checkpoint_seam(spark, tmp_path):
    """checkpoint_dir switches per-round materialization to reliable
    checkpoint() (the cluster fault-tolerance arm); results must be
    identical to the localCheckpoint default, and checkpoint files must
    actually land in the directory."""
    edges = [(1, 2), (2, 3), (7, 8)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ckdir = str(tmp_path / "cc_ck")
    got = {
        r["doc_id"]: r["component"]
        for r in D.connected_components(pairs, checkpoint_dir=ckdir).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    import os

    assert any(files for _, _, files in os.walk(ckdir)), (
        "reliable checkpoint dir is empty — checkpoint() arm did not run"
    )


def _clustered_embeddings(spark, n_clusters=20, per_cluster=4, n_random=80,
                          dim=64, seed=7):
    """Deterministic fixture with TRUE near-dup structure: n_clusters base
    directions, per_cluster noisy copies each (pairwise cos ~0.97+), plus
    n_random unrelated vectors — the recall measurement corpus the driver's
    near-orthogonal embeddings table cannot provide."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + 0.02 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(n_random):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_near_dup_recall_vs_exact_arm(spark):
    """Composed LSH dedup (banded candidates -> exact verify) vs the
    all-pairs exact arm on a clustered fixture: precision 1.0 by
    construction (both arms verify with the same cosine), recall must clear
    the banding model's floor (6 bands x 8 planes at cos>=0.9 => ~0.87)."""
    from corsearch_project_spark.operators import simsearch as S

    emb = _clustered_embeddings(spark)
    thr = 0.9
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in S.near_dup_pairs(emb, threshold=thr, max_id=10**9).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_near_dup_pairs(emb, threshold=thr).collect()
    }
    assert exact, "clustered fixture must contain true near-dup pairs"
    assert lsh <= exact  # exact verification => no false positives
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.7, f"recall {recall:.3f} below banding floor"


def test_lsh_multiprobe_improves_recall(spark):
    """Multi-probe (Hamming-1 buckets) vs single-bucket LSH ANN on the
    clustered fixture: the probed candidate set is a strict superset, so
    recall@k vs brute force can only go up — and on a corpus with true
    neighbors it must find at least as many of the brute-force top-k."""
    from corsearch_project_spark.operators import simsearch as S

    emb = _clustered_embeddings(spark)
    k = 5
    bf = [r["vec_id"] for r in S.brute_force_topk(emb, 0, k=k).collect()]
    single = {r["vec_id"] for r in S.lsh_topk(emb, 0, k=k).collect()}
    multi = {r["vec_id"] for r in S.lsh_topk(emb, 0, k=k, multiprobe=True).collect()}
    r_single = len(single & set(bf)) / k
    r_multi = len(multi & set(bf)) / k
    assert r_multi >= r_single
    assert r_multi >= 0.6, f"multiprobe recall@{k} {r_multi:.2f} too low"


def test_lsh_signature_arrow_equals_catalyst_arm(spark):
    """The Arrow matmul signature pass must be BIT-IDENTICAL to the
    Catalyst expression arm — same md5-parity sign matrix, same HALF_UP
    quantization, same qe/qn/bucket — on real embeddings (sf smoke) for
    both a narrow (8) and wide (48) plane count."""
    from corsearch_project_spark.operators import simsearch as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    for n_planes in (8, 48):
        arrow = {
            r["vec_id"]: (tuple(r["qe"]), r["bucket"], r["qn"])
            for r in S.lsh_signature_arrow(emb, n_planes).collect()
        }
        expr = {
            r["vec_id"]: (tuple(r["qe"]), r["bucket"], r["qn"])
            for r in S.with_qnorm(S.with_lsh_bucket(emb, n_planes)).collect()
        }
        assert arrow == expr, f"signature arms diverge at n_planes={n_planes}"


def test_decontaminate_plan_broadcasts_eval_shingles(spark):
    """q_decontaminate must broadcast the (tiny) eval shingle set against
    the candidate explode — a shuffled join on shingle content would move
    the full corpus's n-grams at 10^12 docs."""
    from corsearch_project_spark.queries import REGISTRY

    df = REGISTRY["q_decontaminate"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_substring_dup_plan_linear_no_python(spark):
    """q_dedup_substring's plan must stay in the linear-shuffle class:
    equi-joins only (no cartesian / nested-loop), zero Python stages, and
    a bounded exchange count (gram agg, semi-join, per-doc window, final
    left join)."""
    from corsearch_project_spark.operators.dedup import substring_dup_stats

    df = spark.range(50).selectExpr(
        "id AS doc_id",
        "concat('w', id % 7, ' shared run of words common tail piece x y z ', id)"
        " AS text",
    )
    plan = substring_dup_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
    assert plan.count("Exchange") <= 6, plan


def test_bitext_lsh_arm_recall_and_plan(spark):
    """The banded bitext scale arm: recall >=0.85 of the exact arm's mined
    pairs on the contract table at the bitext default (4-bit bands;
    measured 0.87 at sf0.001, 0.93 at sf0.01),
    identical cosines on every common pair (candidates are scored with
    the exact quantized cosine), and a plan with no all-pairs operator."""
    from corsearch_project_spark.operators.simsearch import (
        bitext_margin_pairs,
        bitext_margin_pairs_lsh,
    )
    from corsearch_project_spark.queries.base import t

    emb = t(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["src"], r["dst"]): (r["cos"], r["margin"])
        for r in bitext_margin_pairs(emb).collect()
    }
    lsh = {
        (r["src"], r["dst"]): (r["cos"], r["margin"])
        for r in bitext_margin_pairs_lsh(emb).collect()
    }
    common = set(exact) & set(lsh)
    assert len(common) / len(exact) >= 0.85, (len(common), len(exact))
    for p in common:
        assert exact[p][0] == lsh[p][0], p  # exact cosine on candidates

    plan = (
        bitext_margin_pairs_lsh(emb, checkpoint=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
