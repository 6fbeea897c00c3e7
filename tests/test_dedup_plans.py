"""Plan-equivalence gates for the scale-path dedup operators: the banded
(linear-shuffle) plans must produce exactly the relation the quadratic
control plans produce — recall guarantees, not heuristics."""

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
