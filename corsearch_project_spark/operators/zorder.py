"""Z-order (Morton) clustering for multi-column data skipping.

Why a corpus engine ships this: the file-level manifest (S15,
sources/manifest.py) prunes on per-file min/max bounds, which only works
for columns the data is SORTED by. A lexicographic sort gives perfect
bounds on the first column and useless bounds on every other; at 10^12
docs the recrawl scheduler probes (host, fetch_ts), the quality auditor
probes (lang, quality) — two-dimensional lookups that a one-dimensional
sort cannot serve. Z-ordering interleaves the bits of the quantized
columns so rows close in ANY dimension land close in the sort order, and
every z-sorted file gets min/max bounds that are tight in EVERY
interleaved column simultaneously (the same layout trick Delta OPTIMIZE
ZORDER BY and Iceberg's sort-order z-transform apply).

Integer-exact and cross-engine portable by construction:

* ``quantize`` maps a BIGINT column into [0, 2^bits) with clamp +
  integer-div linear scaling — pure arithmetic, no floats.
* ``z_key`` interleaves the quantized bits with an UNROLLED shift/mask
  expression — (x>>i & 1) << (N*i + j) summed over i — generated once as
  a SQL string and evaluated verbatim by BOTH Spark and DuckDB (the same
  generate-the-expression-from-one-tuple discipline as the script-census
  ranges). Disjoint bit positions make ``+`` equal ``|``, and 2 × 16 bits
  or 3 × 10 bits stay far inside the BIGINT sign envelope.

Shape at scale: the z-key is a narrow codegen projection (no shuffle, no
Python); clustering a table is ``repartitionByRange(z)`` +
``sortWithinPartitions(z)`` before the bucketed write — one range
exchange, the same cost class as the writer's existing clustering pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def quantize_sql(col: str, lo: int, hi: int, bits: int,
                 div_op: str = "div") -> str:
    """SQL expression quantizing BIGINT ``col`` from [lo, hi] into
    [0, 2^bits): clamp, shift to zero, integer-scale. Engine-portable
    modulo the integer-division spelling (Spark ``div``, DuckDB ``//`` —
    the ONE dialect difference, parameterized so both engines evaluate
    the otherwise-identical generated expression)."""
    if hi <= lo:
        raise ValueError("hi must exceed lo")
    top = (1 << bits) - 1
    span = hi - lo
    clamped = f"LEAST(GREATEST(CAST({col} AS BIGINT), {lo}), {hi})"
    return f"((({clamped}) - {lo}) * {top} {div_op} {span})"


def z_key_sql(quantized: Sequence[str], bits: int) -> str:
    """SQL expression interleaving N already-quantized [0, 2^bits)
    expressions into one BIGINT Morton key. Unrolled: term (i, j) plants
    bit i of column j at position N*i + j; positions are disjoint so the
    sum is the bitwise OR. N*bits must stay <= 62 (sign-safe BIGINT)."""
    n = len(quantized)
    if n * bits > 62:
        raise ValueError("n_cols * bits must be <= 62 for sign-safe BIGINT")
    terms = []
    for j, q in enumerate(quantized):
        for i in range(bits):
            bit = f"((({q}) >> {i}) & 1)"
            terms.append(f"({bit} << {n * i + j})")
    return "(" + " + ".join(terms) + ")"


def z_key(
    df_cols: Sequence[str],
    bounds: Sequence[tuple],
    bits: int = 16,
) -> Column:
    """Column: Morton key over ``df_cols`` with per-column (lo, hi)
    quantization bounds. Bounds are DEPLOYMENT metadata (min/max from the
    lineage ledger or a prior scan) — passing constants keeps the whole
    key a foldable codegen projection; deriving them inline would force a
    scalar-subquery barrier into every write."""
    qs = [quantize_sql(c, lo, hi, bits) for c, (lo, hi) in zip(df_cols, bounds)]
    return F.expr(z_key_sql(qs, bits))


def cluster_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bounds: Sequence[tuple],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Re-cluster ``df`` for a z-ordered write: range-partition on the
    Morton key into ``n_files`` tasks, sort within each — every output
    file then carries tight min/max bounds in EVERY z-column, which is
    what the manifest prunes on. One range exchange; the key column is
    dropped before write (it is derivable, storing it would be dead
    weight)."""
    keyed = df.withColumn("__z", z_key(cols, bounds, bits))
    return (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
