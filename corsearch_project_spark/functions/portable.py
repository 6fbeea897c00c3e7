"""Cross-engine-portable Column helpers shared by operators and the query
registry: a 32-bit hash identical in DuckDB, quantized embedding math, and
decimal-widened aggregation (see queries.base docstring for the exactness
rules)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def phash(col: Column) -> Column:
    """Portable 32-bit hash: Spark conv(substr(md5(x),1,8),16,10) ==
    DuckDB ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def quantized(col: Column) -> Column:
    """array<float> -> array<bigint>: round(x*1000) per element (exact
    integer vector math downstream)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(1000.0), 0).cast("long")
    )


def idot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Exact integer dot product of two bigint arrays (SURVEY §2.8 O13) —
    JVM-side, no UDF.

    With ``dim`` given, the product is an EXPLICIT Σ a[i]*b[i] expansion
    that stays inside whole-stage codegen; without it, the general
    aggregate/zip_with higher-order form. The two are arithmetically
    identical (same left-to-right integer adds, same null semantics for
    all-or-nothing arrays), but HOF lambdas are CodegenFallback —
    interpreted and boxed per element, measured ~100× slower — so every
    fixed-dim hot path (cosine verify over candidate pairs, qnorms) must
    pass dim."""
    if dim is not None:
        s: Column = a.getItem(0) * b.getItem(0)
        for i in range(1, dim):
            s = s + a.getItem(i) * b.getItem(i)
        return s
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )
