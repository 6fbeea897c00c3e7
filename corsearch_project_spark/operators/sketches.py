"""Distributed probabilistic sketches with deterministic, portable hashing:
Count-Min (heavy-hitter frequency estimation) and Bloom (set membership).

Why a corpus engine ships these: at 10^12 documents the questions "roughly
how often does this token/url/host occur" and "have we crawled this url"
must be answerable from a structure that is (a) tiny enough to broadcast
and (b) buildable in ONE linear pass with map-side combine — exactly what
a sketch is. Spark's built-ins (approx_count_distinct, bloomFilter on the
JVM) are opaque binaries; these are built as plain DataFrames of integer
cells, so they are inspectable, mergeable (cell-wise SUM / bit OR — the
partial-agg shuffle IS the merge), persistable as parquet beside the data,
and — because the hash is the engine-wide portable md5 construction
(functions/portable.phash) — bit-identical across Spark, DuckDB, and any
other engine that can md5. Determinism is the contract: same input ->
same cells, regardless of partitioning or row order.

Count-Min (Cormode & Muthukrishnan, J.Alg 2005):
  d independent rows of w counters; item x adds its weight to cell
  (j, h_j(x) % w) for each row j; the estimate is min_j of its d cells —
  never an underestimate, over by at most eps*N with prob 1-delta for
  w=ceil(e/eps), d=ceil(ln 1/delta). Build shape: one explode of d row
  indexes per item -> partial agg keyed (row, col). Map-side combine
  collapses each task to <= d*w cells, so shuffle volume is
  #tasks * d * w regardless of corpus size.

Bloom (Bloom, CACM 1970): m bits as ceil(m/32) BIGINT words (32 low bits
used per word — keeping the sign bit and bit-63 semantics out of the
cross-engine contract); item x sets bit h_j(x) % m for j in 0..k-1. Build:
explode k hashes -> (word_idx, OR of set bits) partial agg. Probe: an item
is claimed present iff ALL k bits are set — no false negatives by
construction; false positives at the documented (1-e^{-kn/m})^k rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from corsearch_project_spark.functions.portable import phash

BITS_PER_WORD = 32


def _hash_j(col: Column, j: int | Column) -> Column:
    """Row-j member of the portable hash family: md5 over 'j:value'.
    Independent-enough rows for sketch guarantees, reproducible in any
    engine with md5."""
    jcol = F.lit(j) if isinstance(j, int) else j
    return phash(F.concat(jcol.cast("string"), F.lit(":"), col.cast("string")))


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """-> sparse sketch cells (row, col, n) — at most depth*width rows.

    One explode of ``depth`` row indexes per item, one partial-agg shuffle
    keyed (row, col). Cells absent from the output are zero. Merging two
    sketches of the same shape = union + re-agg (cell-wise sum).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        items.select(
            F.col(item_col).alias("item"), w.alias("w"),
            F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
        )
        .select(
            "row",
            (_hash_j(F.col("item"), F.col("row")) % F.lit(width)).alias("col"),
            "w",
        )
        .groupBy("row", "col")
        .agg(F.sum("w").alias("n"))
    )


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """-> (item, est) per probe row: min over the item's d cells.

    The sketch is depth*width rows — broadcast-sized by construction; the
    probe explode is d rows per probe. Cells the sketch never touched are
    exact zeros (left join + coalesce), so unseen items estimate 0.
    """
    cells = (
        probes.select(
            F.col(item_col).alias("item"),
            F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
        )
        .select(
            "item", "row",
            (_hash_j(F.col("item"), F.col("row")) % F.lit(width)).alias("col"),
        )
        .join(F.broadcast(sketch), ["row", "col"], "left")
    )
    return (
        cells.groupBy("item")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est"))
    )


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    n_bits: int = 512,
    n_hashes: int = 3,
) -> DataFrame:
    """-> (word_idx, bits) — the filter as ceil(n_bits/32) BIGINT words
    (32 bits used per word). One explode of k hash indexes per item, one
    partial-agg shuffle keyed word_idx; bit_or is the map-side combiner
    AND the merge operator for unioning filters."""
    pos = _hash_j(F.col(item_col), F.col("j")) % F.lit(n_bits)
    return (
        items.select(
            F.col(item_col).alias("item"),
            F.explode(F.array(*[F.lit(j) for j in range(n_hashes)])).alias("j"),
        )
        .select(pos.alias("pos"))
        .select(
            F.expr(f"pos div {BITS_PER_WORD}").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS LONG), CAST(pos % {BITS_PER_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    item_col: str = "item",
    n_bits: int = 512,
    n_hashes: int = 3,
) -> DataFrame:
    """-> (item, claimed) per probe: claimed=true iff all k bits set.
    The filter (<= n_bits/32 rows) broadcasts; absent words are all-zero."""
    pos = _hash_j(F.col(item_col), F.col("j")) % F.lit(n_bits)
    hits = (
        probes.select(
            F.col(item_col).alias("item"),
            F.explode(F.array(*[F.lit(j) for j in range(n_hashes)])).alias("j"),
        )
        .select("item", pos.alias("pos"))
        .select(
            "item",
            F.expr(f"pos div {BITS_PER_WORD}").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS LONG), CAST(pos % {BITS_PER_WORD} AS INT))"
            ).alias("bit"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0),
        )
    )
    return hits.groupBy("item").agg(
        F.min(F.col("hit").cast("int")).cast("boolean").alias("claimed")
    )


def hist_build(
    df: DataFrame,
    value_col: str,
    width: int,
    n_bins: int,
    keys: tuple = (),
) -> DataFrame:
    """Equi-width histogram relation (*keys, bin, n) over a BIGINT value.

    bin = least(value div width, n_bins-1): a FIXED bin domain shared by
    every build, which is what makes the relation a mergeable sketch —
    merging two histograms is a groupBy-SUM over the union (the partial
    agg IS the merge, exactly as with the Count-Min cells above). Values
    past the last edge clamp into the overflow bin; empty bins are absent
    rows (a census, not a dense vector — densify at read time if needed).
    Shape: one partial-agg shuffle whose map-side combine caps each task's
    output at |keys-domain| * n_bins rows regardless of corpus size. The
    10^12-doc use: per-host doc-length / fetch-latency distributions kept
    fresh by unioning each increment's build into the stored relation.
    """
    bin_ = F.least(
        F.expr(f"CAST({value_col} AS BIGINT) div {width}"),
        F.lit(n_bins - 1).cast("long"),
    ).cast("int")
    return (
        df.select(*keys, bin_.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hist_merge(hists: list, keys: tuple = ()) -> DataFrame:
    """Union-and-sum merge of histogram relations built with the SAME
    (width, n_bins): exact — counts are associative BIGINT sums."""
    merged = hists[0]
    for h in hists[1:]:
        merged = merged.unionByName(h)
    return merged.groupBy(*keys, "bin").agg(
        F.sum("n").cast("long").alias("n")
    )


# ---------------------------------------------------- HyperLogLog

# p=8 -> m=256 registers; the portable 32-bit hash leaves w=24 rank bits
# (max rank 25), so the scaled harmonic sum Σ 2^(50-reg) stays an exact
# BIGINT (256 · 2^50 < 2^59). Constants inlined as literals so both
# engines use the SAME doubles (no re-derived arithmetic to drift):
HLL_P = 8
HLL_M = 256
HLL_W = 24
_HLL_NUM = 5.2999162811336204e+19  # alpha_256 * m^2 * 2^50
_HLL_LINEAR_CUT = 640.0  # 2.5 * m


def hll_registers(
    df: DataFrame, key_col: str, group_cols: tuple = ()
) -> DataFrame:
    """HyperLogLog register relation (Flajolet et al., AofA 2007) — the
    third mergeable sketch beside the Count-Min cells and the Bloom words,
    same contract: a small inspectable DataFrame whose partial agg IS the
    merge. bucket = hash % m, rank = leading-zero count of the remaining
    w bits + 1 — computed portably as w - bitwidth(r) + 1 with bitwidth =
    len(binary string) (Spark conv(r,10,2) == DuckDB bin(r), both
    unpadded). One explode-free groupBy: shuffle volume ≤ #tasks · m
    per group, whatever the corpus size."""
    h = phash(F.col(key_col))
    bucket = (h % HLL_M).alias("bucket")
    rl = ((h - (h % HLL_M)) / HLL_M).cast("long")
    rank = (
        F.when(rl == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W) - F.length(F.conv(rl.cast("string"), 10, 2)) + 1)
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket, rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_merge(regs: list, group_cols: tuple = ()) -> DataFrame:
    """Union-merge register relations: register-wise max — associative and
    idempotent, so increments, reruns and cross-snapshot unions all
    converge to the same sketch (the bit_or analogue for Bloom)."""
    out = regs[0]
    for other in regs[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(regs: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Cardinality estimate from a register relation, with the standard
    small-range linear-counting correction. All register math is exact
    integers (Σ 2^(50-reg) as BIGINT); the final division — and, on the
    correction branch, one ln — are single double ops with identical
    operand order on both engines."""
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("CAST(power(2, 50 - reg) AS BIGINT)")).alias("s_present"),
    )
    v_zero = (F.lit(HLL_M) - F.col("n_present")).cast("long")
    ssc = F.col("s_present") + v_zero * F.lit(2**50)
    e_raw = F.lit(_HLL_NUM) / ssc.cast("double")
    est = F.when(
        (e_raw <= F.lit(_HLL_LINEAR_CUT)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))
