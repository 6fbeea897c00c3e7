"""Deterministic integer k-means (Lloyd) over embedding vectors.

Why a corpus engine clusters embeddings: data-mixing and SemDeDup-style
curation (Abbas et al. 2023) both start from "group the corpus into K
semantic cells"; IVF ANN (operators/simsearch.py) needs exactly the same
cells as its index partitions. `ivf_cells` is the single assignment pass;
this module adds the Lloyd refinement loop — and keeps the engine-wide
determinism contract while doing it:

  * vectors are quantized to integers (functions/portable.quantized:
    round(x*1000)), so squared-L2 distances are exact BIGINTs;
  * the argmin is total-ordered (distance ASC, centroid id ASC);
  * the centroid update is FLOOR division of exact integer sums —
    computed with the portable remainder identity
    ``(s - ((s % c) + c) % c) div c`` because engines disagree on
    negative integer division (Spark ``div`` truncates toward zero,
    DuckDB ``//`` floors); the identity is floor division in both.

Same input -> same centroids, same cells, bit-for-bit, on any engine and
any partitioning — which is what makes the K-round SQL unrolling an exact
oracle, the cluster assignment reproducible across incremental reruns,
and cells stable enough to use as physical partition keys.

Plan shape per round (corpus N, clusters K, dims D):
  assignment — K centroids broadcast, distance inside one codegen
  projection per (vector, centroid), partial min(struct) argmin keyed
  vec_id: no window over the big side, one shuffle;
  update — posexplode to (cell, dim) rows, partial agg: one shuffle of
  N*D narrow rows with map-side combine to <= K*D per task; centroid
  arrays rebuilt K*D-sized.
Rounds chain through localCheckpoint (K*D rows — cheap) so lineage stays
shallow; empty cells drop (standard Lloyd), so K can only shrink.
At 10^12 vectors the assignment is the dominant cost and is embarrassingly
parallel; the update's shuffle is #tasks*K*D — both linear, no all-pairs.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

from corsearch_project_spark.operators.simsearch import with_quantized


def _floor_div(s: str, c: str) -> str:
    """SQL-expr floor division of BIGINTs, identical across engines."""
    return f"(({s}) - ((({s}) % ({c})) + ({c})) % ({c})) div ({c})"


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, qe, cell, dist): exact-integer argmin assignment; ties to
    the smaller centroid id via lexicographic min(struct)."""
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "dist",
        F.expr(
            "aggregate(zip_with(qe, cqe, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ),
    )
    picked = scored.groupBy("vec_id", "qe").agg(
        F.min(F.struct("dist", "cent_id")).alias("m")
    )
    return picked.select(
        "vec_id", "qe", F.col("m.cent_id").alias("cell"),
        F.col("m.dist").alias("dist"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """(cent_id, cqe): floor-div integer mean per cell, dim-wise via one
    posexplode + partial agg; arrays rebuilt in dim order."""
    dims = assigned.select(
        "cell", F.posexplode(F.col("qe")).alias("dim", "v")
    )
    per_dim = dims.groupBy("cell", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    ).select(
        "cell", "dim", F.expr(_floor_div("s", "c")).alias("val")
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "val"))),
            lambda x: x["val"],
        ).alias("cqe")
    ).select(F.col("cell").alias("cent_id"), "cqe")


def kmeans(
    df: DataFrame,
    stride: int = 50,
    rounds: int = 3,
    id_col: str = "vec_id",
) -> Tuple[DataFrame, DataFrame]:
    """Lloyd k-means: ``rounds`` assignment passes with ``rounds - 1``
    centroid updates between them (the classic unrolling an exact SQL twin
    can replay). Initial centroids are the vectors with id % stride == 0 —
    the same deterministic seeding as ivf_cells. Returns
    ``(centroids, assignment)`` where assignment carries the FINAL
    (vec_id, cell, dist)."""
    vecs = with_quantized(df.withColumnRenamed(id_col, "vec_id")).select(
        "vec_id", "qe"
    )
    cents = vecs.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("qe").alias("cqe")
    )
    assigned = _assign(vecs, cents)
    for _ in range(rounds - 1):
        cents = _update(assigned).localCheckpoint()
        assigned = _assign(vecs, cents)
    return cents, assigned.select("vec_id", "cell", "dist")


def cluster_census(assigned: DataFrame) -> DataFrame:
    """(cell, n, inertia): member count + exact-BIGINT within-cluster sum
    of squared distances — the convergence/quality number Lloyd monitors."""
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dist").cast("long").alias("inertia"),
    )


def semdedup(
    df: DataFrame,
    stride: int = 50,
    rounds: int = 3,
    threshold: float = 0.35,
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster, then near-dup ONLY within
    cells — the clustering is what makes semantic dedup tractable at
    10^12 docs, turning the corpus-wide pairwise problem into
    sum-over-cells of bounded self-joins (fan-out <= max cell size per
    row; AQE skew-split covers pathological mega-cells). The keep rule is
    deterministic: a vector drops iff a SMALLER-id cell-mate sits within
    cosine >= threshold (rounded to 6 dp — the engine-wide exact-compare
    convention), so reruns and engines agree vector-by-vector.

    -> (cell, n, n_dropped) per final cell, the curation census; pair the
    kept set by anti-joining the dropped relation when materializing.
    """
    from corsearch_project_spark.operators.simsearch import cosine_q

    _cents, assigned = kmeans(df, stride=stride, rounds=rounds, id_col=id_col)
    vecs = with_quantized(df.withColumnRenamed(id_col, "vec_id")).select(
        "vec_id", "qe"
    )
    m = assigned.select("vec_id", "cell").join(vecs, "vec_id")
    a = m.select(
        F.col("cell"), F.col("vec_id").alias("vec_a"), F.col("qe").alias("qa")
    )
    b = m.select(
        F.col("cell"), F.col("vec_id").alias("vec_b"), F.col("qe").alias("qb")
    )
    dropped = (
        a.join(b, ["cell"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cosine_q(F.col("qa"), F.col("qb")) >= F.lit(threshold))
        .select("vec_b")
        .distinct()
    )
    flagged = m.join(
        dropped.withColumnRenamed("vec_b", "vec_id").withColumn(
            "is_dropped", F.lit(1)
        ),
        "vec_id",
        "left",
    )
    return (
        flagged.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
        .orderBy("cell")
    )
