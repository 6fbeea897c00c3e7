"""Similarity search over an embedding column (array<float>).

Tiers (SURVEY-mandated training-data ops):

  * brute-force cosine top-k — the correctness baseline: one broadcast of
    the query vector, a JVM higher-order-function dot product per row, and
    TakeOrderedAndProject for the top-k (no global sort).
  * LSH-bucketed ANN (+ multi-probe) — 8 sign-random-projection hyperplanes
    (derived from the portable hash so the DuckDB oracle reproduces them)
    assign each vector a bucket; search touches only the query's bucket
    (or its Hamming-1 neighborhood). At 10^12 rows the bucket column
    becomes the table's partition key, so candidate retrieval is a
    partition-pruned scan, not a full pass.
  * Composed embedding dedup (`lsh_near_dup_pairs`) — wide (48-plane)
    banded signatures via ONE Arrow matmul stage (`lsh_signature_arrow`;
    see its docstring for why Catalyst loses at this width), banded
    equi-join candidates, exact quantized-cosine verify.
  * IVF — broadcast centroids, partial-agg argmax assignment, probe-set
    search.

All arithmetic is quantized (round(x*1000) → bigint) making dot products
and norms exact integers; the single double division + sqrt at the end is
performed with identical operand order on both engines (queries.base).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from corsearch_project_spark.functions.portable import idot, phash, quantized

N_PLANES = 8


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("qe", quantized(F.col(vec_col)))


DIM = 64  # embedding dimensionality of the contract table (TESTDATA.md)


def with_qnorm(df: DataFrame, out: str = "qn") -> DataFrame:
    """Materialize the (exact integer) self-dot once per vector so join-side
    scoring never recomputes norms per pair — at k centroids or b bucket
    candidates that is k×/b× fewer dot-product evaluations."""
    return df.withColumn(out, idot(F.col("qe"), F.col("qe")))


def cosine_q(qa: Column, qb: Column) -> Column:
    """Cosine over quantized vectors: exact integer dot/norms, one double
    division — rounded to 6 places to absorb nothing (it is deterministic)
    but to give the oracle a stable surface."""
    return F.round(
        idot(qa, qb).cast("double")
        / F.sqrt(idot(qa, qa).cast("double") * idot(qb, qb).cast("double")),
        6,
    )


def cosine_qn(
    qa: Column, qb: Column, na: Column, nb: Column, dim: int | None = None
) -> Column:
    """cosine_q with both norms precomputed (with_qnorm). Bit-identical:
    the same integer norms cast to double through the same expression.

    ``dim`` opts into idot's explicit codegen expansion — pass it ONLY on
    single-pair hot paths (the LSH verify join); expanding it inside
    many-centroid scoring multiplies the expression tree by the centroid
    count and Janino compile time dominates (measured: q_sim_ivf_ann
    2.3 s → 8.3 s when expansion leaked into the IVF argmax)."""
    return F.round(
        idot(qa, qb, dim=dim).cast("double")
        / F.sqrt(na.cast("double") * nb.cast("double")),
        6,
    )


def brute_force_topk(
    df: DataFrame, query_vec_id: int, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Top-k cosine neighbors of one vector, ties broken by id."""
    base = with_qnorm(with_quantized(df))
    q = base.where(F.col(id_col) == query_vec_id).select(
        F.col("qe").alias("q_qe"), F.col("qn").alias("q_qn")
    )
    cand = base.where(F.col(id_col) != query_vec_id)
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_qn(
                F.col("qe"), F.col("q_qe"), F.col("qn"), F.col("q_qn")
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _plane_sign_py(p: int, i: int) -> int:
    """±1 hyperplane component: same portable-hash derivation the DuckDB
    oracle replays in SQL (md5 first 8 hex → int, parity → sign). Computed
    driver-side because the sign matrix is a CONSTANT (n_planes × dim) —
    hashing it per (vector, dim, plane) row cost 1M md5 calls at 2k vecs."""
    import hashlib

    h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 1 else -1


def plane_matrix(n_planes: int, dim: int):
    return [[_plane_sign_py(p, i) for i in range(dim)] for p in range(n_planes)]


def with_lsh_bucket(
    df: DataFrame, n_planes: int = N_PLANES, dim: int = 64, id_col: str = "vec_id"
) -> DataFrame:
    """(id, qe, bucket): bucket = Σ_p (⟨sgn_p, qe⟩ > 0) << p over the
    constant sign matrix — one narrow projection per row, no joins, no
    shuffles; the bucket column is what a 10^12-row table partitions on.

    The per-plane projection is an EXPLICIT ±element_at sum, not an
    aggregate/zip_with HOF: higher-order lambdas are CodegenFallback
    (interpreted, boxed, ~100× slower per element — measured 10.9 s for
    2000 rows × 48 planes vs 0.1 s for this form). dim×n_planes explicit
    terms stay inside whole-stage codegen, which is the only shape that
    survives a 10^12-row signature pass."""
    planes = plane_matrix(n_planes, dim)
    qe = F.col("qe")
    elems = [qe.getItem(i) for i in range(dim)]
    bucket: Column = F.lit(0).cast("long")
    for p, row in enumerate(planes):
        pos = [elems[i] for i in range(dim) if row[i] > 0]
        neg = [elems[i] for i in range(dim) if row[i] < 0]
        proj: Column = pos[0] if pos else F.lit(0).cast("long")
        for e in pos[1:]:
            proj = proj + e
        for e in neg:
            proj = proj - e
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return with_quantized(df).select(F.col(id_col), "qe", bucket.alias("bucket"))


def lsh_signature_arrow(
    df: DataFrame, n_planes: int, dim: int = DIM, id_col: str = "vec_id"
) -> DataFrame:
    """(id, qe, bucket, qn) via ONE Arrow-vectorized matmul stage — the
    wide-signature scale path.

    Catalyst offers two native shapes for a 48-plane sign projection and
    both lose: aggregate/zip_with HOFs are CodegenFallback (interpreted +
    boxed per element — measured 10.9 s for 2000 rows), and the explicit
    Σ±qe[i] expansion is a 3072-term expression whose Janino compile alone
    costs ~10 s per fresh plan. A numpy int64 matmul per Arrow batch is
    exact (same md5-parity sign matrix, HALF_UP quantization identical to
    F.round), bucket-equal to the Catalyst arm (gated in
    tests/test_dedup_plans.py), and runs at memory bandwidth. Same
    mapInArrow discipline as the extraction kernel: one Python stage, no
    per-row Python. The 8-plane ANN path stays pure-JVM (`with_lsh_bucket`)
    where the expression is small enough for codegen."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    planes_t = np.array(plane_matrix(n_planes, dim), dtype=np.int64).T  # dim×P
    shifts = np.arange(n_planes, dtype=np.int64)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("qe", T.ArrayType(T.LongType())),
            T.StructField("bucket", T.LongType()),
            T.StructField("qn", T.LongType()),
        ]
    )
    arrow_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("qe", pa.list_(pa.int64())),
            pa.field("bucket", pa.int64()),
            pa.field("qn", pa.int64()),
        ]
    )

    def sig(batches):
        for rb in batches:
            pdf = rb.to_pandas()
            v = np.stack(pdf["embedding"].values).astype(np.float64) * 1000.0
            # HALF_UP (away from zero), bit-identical to F.round(x, 0)
            q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            bits = (q @ planes_t > 0).astype(np.int64)
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: pdf[id_col].values,
                    "qe": list(q),
                    "bucket": (bits << shifts).sum(axis=1),
                    "qn": (q * q).sum(axis=1),
                },
                schema=arrow_schema,
            )

    return df.select(id_col, "embedding").mapInArrow(sig, out_schema)


def lsh_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 5,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    multiprobe: bool = False,
) -> DataFrame:
    """ANN: top-k within the query vector's LSH bucket.

    ``multiprobe=True`` also probes every Hamming-1 neighbor bucket (the
    query bucket with one plane bit flipped) — the standard multi-probe
    recall fix: a true neighbor that fell just across ONE hyperplane is
    reachable again. The probe set stays a broadcast relation of
    n_planes+1 bucket ids joined on EQUALITY, so at 10^12 rows it is still
    a partition-pruned scan of n_planes+1 buckets, never a full pass (a
    `bit_count(bucket ^ q_bucket) <= 1` filter would touch every row)."""
    qv = with_qnorm(with_lsh_bucket(df, n_planes, id_col=id_col))
    q = qv.where(F.col(id_col) == query_vec_id).select(
        F.col("qe").alias("q_qe"),
        F.col("qn").alias("q_qn"),
        F.col("bucket").alias("q_bucket"),
    )
    if multiprobe:
        q = q.select(
            "q_qe",
            "q_qn",
            F.explode(
                F.array(
                    F.col("q_bucket"),
                    *[
                        F.col("q_bucket").bitwiseXOR(F.lit(1 << p).cast("long"))
                        for p in range(n_planes)
                    ],
                )
            ).alias("q_bucket"),
        )
    return (
        qv.crossJoin(F.broadcast(q))
        .where((F.col("bucket") == F.col("q_bucket")) & (F.col(id_col) != query_vec_id))
        .select(
            F.col(id_col),
            cosine_qn(
                F.col("qe"), F.col("q_qe"), F.col("qn"), F.col("q_qn")
            ).alias("cos_sim"),
        )
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


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 48,
    band_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """Composed embedding dedup — LSH candidates → exact verification: the
    scale path `near_dup_pairs` cannot be (VERDICT r1 #3).

    Same two-stage shape as MinHash banding→verification: the n_planes sign
    bits are split into (n_planes/band_planes) bands; two vectors are
    candidates iff they agree on ALL bits of at least one band (an equi-join
    on (band, band_value) — only bucket keys shuffle, no all-pairs). Each
    candidate is then verified with the exact quantized cosine. Precision is
    therefore 1.0 by construction; recall is the banding probability
    (1-(1-p^band_planes)^n_bands, p = 1-θ/π), measured against the exact arm
    in tests/test_dedup_plans.py on a clustered fixture.

    ``band_planes`` is the fan-out knob and MUST grow with n: expected
    candidates ≈ n²·n_bands/2^band_planes, so bucket width 2^band_planes
    is sized to keep per-bucket membership near-constant (8 bits → 256
    buckets/band; the r1 default of 4 bits → 16 buckets produced 12% of
    ALL pairs as candidates at n=2000 — quadratic in disguise). 48/8 keeps
    model recall ≈0.87 at cos≥0.9 while cutting candidates 16×.

    At 10^12 rows: signature pass is narrow per-row projections (no
    shuffle), the band self-join shuffles only (band, value) keys, and the
    verify join pulls just the candidate pairs' vectors."""
    if n_planes % band_planes:
        raise ValueError("band_planes must divide n_planes")
    n_bands = n_planes // band_planes
    mask = (1 << band_planes) - 1
    # The bucketed relation feeds four join sides (two banded, two verify);
    # persist so the signature matmul runs once per row — at cluster scale
    # this is the materialized signature/bucket table (same shape as
    # minhash_lsh_pairs' persisted sig). lsh_signature_arrow (not the
    # Catalyst expression arm) because 48 planes is past the width where
    # codegen stays viable — see its docstring for the measurements.
    qv = lsh_signature_arrow(df, n_planes, dim=dim, id_col=id_col).persist()
    stack_args = ", ".join(
        f"{b}, (shiftright(bucket, {b * band_planes}) & {mask})"
        for b in range(n_bands)
    )
    banded = qv.selectExpr(
        f"{id_col} AS vid", f"stack({n_bands}, {stack_args}) AS (band, bv)"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
        .distinct()
    )
    sa = qv.select(
        F.col(id_col).alias("vec_a"), F.col("qe").alias("qa"), F.col("qn").alias("na")
    )
    sb = qv.select(
        F.col(id_col).alias("vec_b"), F.col("qe").alias("qb"), F.col("qn").alias("nb")
    )
    return (
        cands.join(sa, "vec_a")
        .join(sb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine_qn(
                F.col("qa"), F.col("qb"), F.col("na"), F.col("nb"), dim=dim
            ).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------------------------------- IVF

IVF_STRIDE = 25  # centroid set = vectors with vec_id % stride == 0


def ivf_cells(
    df: DataFrame, stride: int = IVF_STRIDE, id_col: str = "vec_id"
) -> DataFrame:
    """(id, qe, cell): IVF coarse quantization. The centroid set is chosen
    deterministically (ids ≡ 0 mod stride — a seeded sample both engines can
    replay); every vector is assigned to its max-cosine centroid, ties to
    the smaller centroid id.

    Plan shape: centroids broadcast (tiny), one projection per (vector,
    centroid) inside the broadcast join, then a PARTIAL max(struct) per
    vector — the same map-side-reducing argmax idiom as dedupe_latest, no
    window over the big side. At 10^12 rows `cell` becomes the table's
    partition key, so a probe reads only its cells' partitions."""
    qdf = with_qnorm(with_quantized(df))
    cents = qdf.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"),
        F.col("qe").alias("cent_qe"),
        F.col("qn").alias("cent_qn"),
    )
    scored = qdf.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        "qe",
        "cent_id",
        cosine_qn(
            F.col("qe"), F.col("cent_qe"), F.col("qn"), F.col("cent_qn")
        ).alias("cent_sim"),
    )
    picked = scored.groupBy(F.col(id_col), F.col("qe")).agg(
        F.max(
            F.struct(F.col("cent_sim"), (-F.col("cent_id")).alias("ncid"))
        ).alias("m")
    )
    return picked.select(
        F.col(id_col), "qe", (-F.col("m.ncid")).cast("int").alias("cell")
    )


def ivf_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 5,
    nprobe: int = 3,
    stride: int = IVF_STRIDE,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: rank centroids by similarity to the query, search only the
    top-``nprobe`` cells. Probe set and query vector stay as broadcast
    one-row/one-column relations — no driver collect, no global pass."""
    cells = with_qnorm(ivf_cells(df, stride, id_col))
    qdf = with_qnorm(with_quantized(df))
    q = qdf.where(F.col(id_col) == query_vec_id).select(
        F.col("qe").alias("q_qe"), F.col("qn").alias("q_qn")
    )
    cents = qdf.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"),
        F.col("qe").alias("cent_qe"),
        F.col("qn").alias("cent_qn"),
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            F.col("cent_id").alias("cell"),
            cosine_qn(
                F.col("cent_qe"), F.col("q_qe"), F.col("cent_qn"), F.col("q_qn")
            ).alias("psim"),
        )
        .orderBy(F.desc("psim"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    return (
        cells.join(F.broadcast(probe), "cell")
        .where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_qn(
                F.col("qe"), F.col("q_qe"), F.col("qn"), F.col("q_qn")
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ------------------------------------------------- bitext margin mining


def bitext_margin_pairs(
    emb: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    dim: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Margin-based mutual-nearest-neighbor pair mining across two vector
    pools — the CCMatrix/WikiMatrix bitext-mining criterion (Artetxe &
    Schwenk, "Margin-based Parallel Corpus Mining with Multilingual
    Sentence Embeddings", ACL 2019): a pair (a, b) is mined when each is
    the other's nearest neighbor AND the 'ratio' margin

        margin(a, b) = cos(a, b) / mean(top-k cos of a  ∪  top-k cos of b)

    exceeds what generic hubness predicts — raw cosine alone over-selects
    hub vectors; the margin normalizes by each side's local similarity
    scale.

    The two pools here are the label-parity halves of the contract
    embeddings table (a deterministic stand-in for source/target language
    pools, which this sandbox's tables do not carry). The test-scale plan
    is the exact control arm: one ``crossJoin`` with the smaller pool
    broadcast, two window passes for per-side ranks, and an equi-join for
    mutuality — every cosine is the quantized-integer form (module
    docstring), and the top-k means are sums of 6-dp DECIMALs (associative,
    so Spark's partial aggregation and DuckDB's sequential scan agree
    bit-for-bit; the final double division happens once, same operand
    order both engines).

    At 10^12 rows the cross join is replaced by the existing LSH/IVF
    candidate generation (``lsh_topk``/``ivf_topk``) feeding the SAME
    rank + margin tail — the margin only needs each vector's top-k
    *candidates*, never the full pairwise matrix.
    """
    e = with_qnorm(with_quantized(emb))
    a = e.where(F.col("label") % 2 == 0).select(
        F.col(id_col).alias("src"), F.col("qe").alias("qa"), F.col("qn").alias("na")
    )
    b = e.where(F.col("label") % 2 == 1).select(
        F.col(id_col).alias("dst"), F.col("qe").alias("qb"), F.col("qn").alias("nb")
    )
    # The scored pair relation feeds BOTH rank directions below;
    # localCheckpoint it so the cross join and the cosine evaluate once per
    # pair, not once per direction (same move as minhash/lsh signature
    # reuse). localCheckpoint, NOT persist: a SQL-level persist is pinned
    # in the CacheManager for the session's lifetime (the largest
    # intermediate of this query leaking across a whole bench sweep),
    # while checkpoint blocks are released by the ContextCleaner once the
    # result is unreferenced — the same lifetime pattern pagerank/HITS use
    # per-round. dim defaults to None — the materialized relation is
    # evaluated ONCE, so the HOF cosine's interpretation cost is linear in
    # pairs while the 64-term expansion pays ~7 s of Janino compile
    # (measured: cold 9.2 s vs 1.8 s at sf0.01).
    # (checkpoint=False is the plan-inspection seam: the pair-generation
    # plan — broadcast small pool, no Python stage — is gated by tests on
    # the un-truncated form, since a checkpoint renders as Scan
    # ExistingRDD and hides it.)
    pairs = a.crossJoin(F.broadcast(b)).select(
        "src",
        "dst",
        cosine_qn(
            F.col("qa"), F.col("qb"), F.col("na"), F.col("nb"), dim=dim
        ).alias("cos"),
    )
    if checkpoint:
        pairs = pairs.localCheckpoint()
    return _margin_tail(pairs, k)


def _margin_tail(pairs: DataFrame, k: int) -> DataFrame:
    """The rank + margin finish shared by the exact arm and the banded
    scale arm: per-side top-k windows over the scored (src, dst, cos)
    relation, mutual-NN equi-join, ratio margin. Decimal(18,6) top-k sums
    keep the denominator order-free; the two double ops at the end run in
    a fixed operand order both engines replay."""
    from pyspark.sql import Window

    cos_d = F.col("cos").cast("decimal(18,6)")
    fwd = pairs.withColumn(
        "rn", F.row_number().over(Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst")))
    )
    fa = fwd.groupBy("src").agg(
        F.max(F.when(F.col("rn") == 1, F.col("dst"))).alias("nn_dst"),
        F.max(F.when(F.col("rn") == 1, F.col("cos"))).alias("nn_cos"),
        F.sum(F.when(F.col("rn") <= k, cos_d)).alias("sk_a"),
        F.count(F.when(F.col("rn") <= k, F.lit(1))).alias("k_a"),
    )
    rev = pairs.withColumn(
        "rn", F.row_number().over(Window.partitionBy("dst").orderBy(F.desc("cos"), F.asc("src")))
    )
    ra = rev.groupBy("dst").agg(
        F.max(F.when(F.col("rn") == 1, F.col("src"))).alias("nn_src"),
        F.sum(F.when(F.col("rn") <= k, cos_d)).alias("sk_b"),
        F.count(F.when(F.col("rn") <= k, F.lit(1))).alias("k_b"),
    )
    denom = (F.col("sk_a") + F.col("sk_b")).cast("double") / (
        F.col("k_a") + F.col("k_b")
    ).cast("double")
    return (
        fa.join(
            ra,
            (fa["nn_dst"] == ra["dst"]) & (ra["nn_src"] == fa["src"]),
        )
        .select(
            "src",
            F.col("dst"),
            F.col("nn_cos").alias("cos"),
            F.round(F.col("nn_cos") / denom, 6).alias("margin"),
        )
    )


def bitext_margin_pairs_lsh(
    emb: DataFrame,
    k: int = 4,
    n_planes: int = 48,
    band_planes: int = 4,
    id_col: str = "vec_id",
    checkpoint: bool = True,
) -> DataFrame:
    """The 10^12-row bitext arm the exact form's docstring promises: the
    cross join is replaced by sign-LSH banded candidate generation — the
    SAME signature/banding construction as ``lsh_near_dup_pairs``, but the
    band equi-join crosses the two pools instead of self-joining one — and
    every candidate is scored with the exact quantized cosine before the
    shared ``_margin_tail``.

    Semantics: top-k / nearest-neighbor are computed over each vector's
    CANDIDATES, so mined pairs are recall-gated against the exact arm (a
    pair is lost only when the two vectors agree on no band — the
    ``lsh_near_dup_pairs`` recall model; measured in
    tests/test_dedup_plans.py). Precision of the margin itself is
    unchanged: every emitted cosine is exact.

    ``band_planes`` tunes the similarity regime, and bitext wants it
    NARROWER than near-dup: dedup hunts cos>=0.9 pairs (8-bit bands keep
    recall ~0.87 there), while mined translation pairs live at moderate
    cosine — on the contract table (NN cos median ~0.38) 8-bit bands
    recall only 0.18 of the exact arm's pairs, 4-bit bands 0.93
    (measured, sf0.01). The price is fan-out: expected candidates
    ~|A|·|B|·n_bands/2^band_planes on unstructured pools — size
    band_planes UP as the pools' similarity floor rises.

    Shuffle shape: one Arrow matmul signature pass, a (band, bv) equi-join
    whose volume is bucket-bounded, two candidate-keyed window passes —
    no all-pairs anywhere (plan-gated: no CartesianProduct/crossJoin)."""
    if n_planes % band_planes:
        raise ValueError("band_planes must divide n_planes")
    n_bands = n_planes // band_planes
    mask = (1 << band_planes) - 1
    lab = emb.select(F.col(id_col).alias("__lid"), F.col("label"))
    # localCheckpoint, NOT persist: the signature relation feeds three
    # consumers (banding + both cosine sides) and a persist would pin it
    # in the CacheManager for the session's lifetime — the leak the exact
    # arm's comment warns about; checkpoint blocks release with the
    # result's lifetime.
    qv = (
        lsh_signature_arrow(emb, n_planes, id_col=id_col)
        .join(lab, F.col(id_col) == F.col("__lid"))
        .drop("__lid")
        .localCheckpoint()
    )
    stack_args = ", ".join(
        f"{b}, (shiftright(bucket, {b * band_planes}) & {mask})"
        for b in range(n_bands)
    )
    banded = qv.selectExpr(
        f"{id_col} AS vid", "label", f"stack({n_bands}, {stack_args}) AS (band, bv)"
    )
    a = banded.where(F.col("label") % 2 == 0).alias("a")
    b = banded.where(F.col("label") % 2 == 1).alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bv") == F.col("b.bv")),
        )
        .select(F.col("a.vid").alias("src"), F.col("b.vid").alias("dst"))
        .distinct()
    )
    sa = qv.select(
        F.col(id_col).alias("src"), F.col("qe").alias("qa"), F.col("qn").alias("na")
    )
    sb = qv.select(
        F.col(id_col).alias("dst"), F.col("qe").alias("qb"), F.col("qn").alias("nb")
    )
    pairs = (
        cands.join(sa, "src")
        .join(sb, "dst")
        .select(
            "src",
            "dst",
            cosine_qn(
                F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")
            ).alias("cos"),
        )
    )
    if checkpoint:
        pairs = pairs.localCheckpoint()
    return _margin_tail(pairs, k)
