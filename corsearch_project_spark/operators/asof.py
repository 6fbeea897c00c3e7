"""As-of join (SURVEY §2.5 J6) as a reusable operator with two physical
strategies, because the right plan depends on data shape:

  * ``asof_join_rownum`` — range join + row_number()=1. Simple, but the
    intermediate join materializes every (event, earlier-order) pair: fine
    when the per-key match count is small or one side broadcasts, quadratic
    in the worst case.
  * ``asof_join_union`` — the merge trick: union both sides tagged, one
    window sort per key, carry the right side's columns forward with
    last(ignorenulls), keep left rows. Cost is ONE shuffle + sort of
    |L|+|R| — linear, the strategy that survives 100× scale-up. (This is
    how time-series stores implement ASOF MERGE.)

Both produce identical results (tested) with deterministic tie-breaks:
right rows at the same timestamp as a left row ARE eligible (at-or-before),
and among equal right timestamps the largest right_order key wins.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join_rownum(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    left_key: str,
    right_order: str,
) -> DataFrame:
    """Latest right row with right_ts <= left_ts per key, via join + rank."""
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = cond & (right[right_ts] <= left[left_ts])
    j = left.join(right, cond, "left")
    w = Window.partitionBy(left_key).orderBy(
        F.desc_nulls_last(right_ts), F.desc_nulls_last(right_order)
    )
    out_cols = [left[c] for c in left.columns] + [right[c] for c in right_cols]
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*out_cols)
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    left_key: str,
    right_order: str,
) -> DataFrame:
    """Same semantics via tagged union + last(ignorenulls) carry-forward —
    one shuffle on the join key, no pairwise blow-up."""
    on = list(on)
    lcols = left.columns
    l_tag = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))  # left sorts AFTER right at equal ts
        .withColumn("_ord", F.lit(None).cast("long"))
    )
    for c in right_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_order).cast("long").alias("_ord"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in on:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows (side=0) sort before left rows (side=1) at equal _ts, and
    # among equal right ts the larger _ord sorts later → last() picks it.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_cf_{c}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_cf_{c}").alias(c) for c in right_cols],
    )
