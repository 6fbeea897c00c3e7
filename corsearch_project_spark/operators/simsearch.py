"""Similarity search over an embedding column (array<float>).

Two tiers (SURVEY-mandated training-data ops):

  * brute-force cosine top-k — the correctness baseline: one broadcast of
    the query vector, a JVM higher-order-function dot product per row, and
    TakeOrderedAndProject for the top-k (no global sort).
  * LSH-bucketed ANN — the scale path: 8 sign-random-projection hyperplanes
    (derived from the portable hash so the DuckDB oracle reproduces them)
    assign each vector a bucket; search touches only the query's bucket.
    At 10^12 rows the bucket column becomes the table's partition key, so
    candidate retrieval is a partition-pruned scan, not a full pass.

All arithmetic is quantized (round(x*1000) → bigint) making dot products
and norms exact integers; the single double division + sqrt at the end is
performed with identical operand order on both engines (queries.base).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from corsearch_project_spark.queries.base import idot, phash, quantized

N_PLANES = 8


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("qe", quantized(F.col(vec_col)))


def cosine_q(qa: Column, qb: Column) -> Column:
    """Cosine over quantized vectors: exact integer dot/norms, one double
    division — rounded to 6 places to absorb nothing (it is deterministic)
    but to give the oracle a stable surface."""
    return F.round(
        idot(qa, qb).cast("double")
        / F.sqrt(idot(qa, qa).cast("double") * idot(qb, qb).cast("double")),
        6,
    )


def brute_force_topk(
    df: DataFrame, query_vec_id: int, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Top-k cosine neighbors of one vector, ties broken by id."""
    q = with_quantized(df).where(F.col(id_col) == query_vec_id).select(
        F.col("qe").alias("q_qe")
    )
    cand = with_quantized(df).where(F.col(id_col) != query_vec_id)
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_q(F.col("qe"), F.col("q_qe")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def plane_sign(plane: Column, dim: Column) -> Column:
    """Deterministic ±1 hyperplane component from the portable hash of
    'plane:dim' — reproducible in ANSI SQL."""
    h = phash(F.concat_ws(":", plane.cast("string"), dim.cast("string")))
    return F.when(h % 2 == 1, F.lit(1)).otherwise(F.lit(-1))


def with_lsh_bucket(df: DataFrame, n_planes: int = N_PLANES, id_col: str = "vec_id") -> DataFrame:
    """bucket = Σ_j (proj_j > 0) << j  over sign-random-projection planes.

    Expressed as explode(dims) × explode(planes) → two hash-partition
    aggregations — every step a plain groupBy, scale-safe."""
    exploded = with_quantized(df).select(
        F.col(id_col), F.posexplode("qe").alias("i", "x")
    )
    per_plane = (
        exploded.select(
            F.col(id_col),
            "i",
            "x",
            F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"),
        )
        .withColumn("term", plane_sign(F.col("p"), F.col("i")) * F.col("x"))
        .groupBy(id_col, "p")
        .agg(F.sum("term").alias("proj"))
    )
    buckets = per_plane.groupBy(id_col).agg(
        F.sum(
            F.expr(
                "CASE WHEN proj > 0 THEN shiftleft(cast(1 AS BIGINT), cast(p AS INT)) ELSE cast(0 AS BIGINT) END"
            )
        ).alias("bucket")
    )
    return buckets


def lsh_topk(
    df: DataFrame, query_vec_id: int, k: int = 5, n_planes: int = N_PLANES, id_col: str = "vec_id"
) -> DataFrame:
    """ANN: top-k within the query vector's LSH bucket only."""
    buckets = with_lsh_bucket(df, n_planes, id_col)
    qv = with_quantized(df).join(buckets, id_col)
    q = qv.where(F.col(id_col) == query_vec_id).select(
        F.col("qe").alias("q_qe"), F.col("bucket").alias("q_bucket")
    )
    return (
        qv.crossJoin(F.broadcast(q))
        .where((F.col("bucket") == F.col("q_bucket")) & (F.col(id_col) != query_vec_id))
        .select(F.col(id_col), cosine_q(F.col("qe"), F.col("q_qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, max_id: int = 300, id_col: str = "vec_id"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, cos ≥ τ) over a
    bounded id range — the verification step that follows LSH candidate
    generation at scale."""
    qdf = with_quantized(df).where(F.col(id_col) < max_id).select(
        F.col(id_col).alias("vid"), "qe"
    )
    a = qdf.select(F.col("vid").alias("vec_a"), F.col("qe").alias("qa"))
    b = qdf.select(F.col("vid").alias("vec_b"), F.col("qe").alias("qb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_q(F.col("qa"), F.col("qb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
