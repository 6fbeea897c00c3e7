"""Token-distribution drift between two crawl snapshots — integer-exact
chi-square (homogeneity) contributions per token.

Why a corpus engine ships this: a recrawl round, a new seed list, or a
crawler bug each shift the corpus's token distribution, and at 10^12
documents the only affordable monitor is a statistic over the two
snapshots' token-count relations (vocab-sized — Zipf-small relative to the
corpus). The standard two-sample chi-square contribution per token t with
counts a, b and snapshot totals Na, Nb reduces algebraically to

    chi2_t = (a*Nb - b*Na)^2 / ((a+b) * Na * Nb)

(substitute E_a = (a+b)*Na/(Na+Nb) into (a-E_a)^2/E_a + (b-E_b)^2/E_b and
simplify: the (Na+Nb) factors cancel). The engine computes chi2_t at a
fixed micro precision — SCALE * d^2 DIV ((a+b)*Na*Nb) over DECIMAL(38,0),
where d = a*Nb - b*Na — so the ranking is bit-identical across engines and
partition orders, where a float chi-square would drift in the last ulp.

Overflow envelope (exact arithmetic): SCALE * d^2 must fit DECIMAL(38,0);
|d| <= max(a,b)*max(Na,Nb) <= N^2 for N = max(Na, Nb) total tokens, so
exactness holds while SCALE * N^4 < 10^38, i.e. N < ~10^8 tokens per
snapshot at SCALE=10^6. For web-scale snapshots pass ``shift`` to
right-shift every token count by 2^shift FIRST (a deterministic, portable
coarsening — the same trick a Count-Min width cap applies): shift=14
admits N ~ 1.6e12 tokens. The statistic is then the chi-square of the
shifted counts — still bit-identical everywhere, and monotone in the same
distributional changes.

Shape at scale: two explode -> partial-agg shuffles (token -> count, each
output vocab-sized), one full-outer equi-join of the two vocab relations
(AQE broadcasts the smaller side when it fits), scalar totals broadcast
via crossJoin. No Python anywhere; top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SCALE = 1_000_000  # chi2 at micro precision


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, n) token-frequency relation: one explode + one partial-agg
    shuffle whose map-side combine collapses each task to its local vocab."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _shifted(col: str, shift: int) -> Column:
    if shift == 0:
        return F.col(col)
    return F.expr(f"{col} div {1 << shift}")


def token_drift(
    counts_a: DataFrame,
    counts_b: DataFrame,
    shift: int = 0,
) -> DataFrame:
    """Per-token drift relation (tok, n_a, n_b, chi2_scaled) between two
    (tok, n) count relations.

    chi2_scaled = SCALE * (n_a*Nb - n_b*Na)^2 DIV ((n_a+n_b) * Na * Nb),
    the exact two-sample chi-square contribution at micro precision, with
    totals Na/Nb taken over the (optionally shifted) counts. Tokens whose
    shifted counts are both zero are dropped (their contribution is 0/0);
    tokens present in only one snapshot keep their full contribution.
    """
    a = counts_a.select(
        "tok", _shifted("n", shift).cast("long").alias("n_a")
    ).where(F.col("n_a") > 0)
    b = counts_b.select(
        "tok", _shifted("n", shift).cast("long").alias("n_b")
    ).where(F.col("n_b") > 0)

    # Scalar totals ride a broadcast nested-loop join (1-row side) so no
    # token-keyed stage waits on a driver collect.
    tot_a = a.agg(F.sum("n_a").cast("long").alias("tot_a"))
    tot_b = b.agg(F.sum("n_b").cast("long").alias("tot_b"))

    merged = (
        a.join(b, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce(F.col("n_a"), F.lit(0).cast("long")).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0).cast("long")).alias("n_b"),
        )
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
    )
    d = "(CAST(n_a AS DECIMAL(38,0)) * tot_b - CAST(n_b AS DECIMAL(38,0)) * tot_a)"
    return merged.select(
        "tok",
        "n_a",
        "n_b",
        F.expr(
            f"CAST(({SCALE} * {d} * {d}) div "
            f"(CAST(n_a + n_b AS DECIMAL(38,0)) * tot_a * tot_b) AS BIGINT)"
        ).alias("chi2_scaled"),
    )


def drift_topk(drift: DataFrame, k: int = 20) -> DataFrame:
    """Top-k drifted tokens, chi2 desc with token tiebreak — compiles to
    TakeOrderedAndProject (no global sort materialization)."""
    return drift.orderBy(F.desc("chi2_scaled"), F.asc("tok")).limit(k)
