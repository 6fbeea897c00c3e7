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


def idot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two bigint arrays via higher-order fns
    (SURVEY §2.8 O13) — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )
