"""Query registry backing the driver contract (``__spark_entry__.py``).

Every operator row from SURVEY.md §2.4–2.8 (plus the training-data ops:
dedup / similarity / text analysis) registers here as a named query with

  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (idiomatic DataFrame
    API — the plan Catalyst should see), and
  - an ANSI-SQL oracle string DuckDB runs on the same parquet (or ``None``
    for genuinely non-SQL-expressible ops → driver records rows-only).

Cross-engine exactness rules (so the driver's order-insensitive value hash
matches bit-for-bit):

  * SUM/AVG over doubles go through ``CAST(x AS DECIMAL(18,4))`` first —
    decimal addition is associative, so partial/final aggregation order
    (Spark) vs sequential scan (DuckDB) cannot change the result; the final
    value is cast back to DOUBLE (deterministic round-to-nearest of the same
    exact decimal on both engines).
  * Integer sums are cast to BIGINT in the oracle (DuckDB widens to HUGEINT,
    Spark does not).
  * Hashes shared by both engines use the portable construction
    ``('0x' || substr(md5(s), 1, 8))::BIGINT``  ==  Spark
    ``conv(substring(md5(s), 1, 8), 16, 10)`` — 32-bit, enough for MinHash /
    SimHash / LSH demos at test scale.
  * Embedding math is quantized to integers (``round(x * 1000)``) before any
    dot product, making dot/norm exact; the one double division + sqrt at
    the end is performed in the same operand order on both engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from corsearch_project_spark.functions.portable import idot, phash, quantized  # noqa: F401


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: Dict[str, QueryDef] = {}


def query(name: str, oracle: Optional[str], doc: str = ""):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (TESTDATA.md) — plain parquet scan, schema from
    the footer (fixed by the driver generator, not inferred row-wise)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- helpers

def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent sum of doubles: decimal-widen, sum, back to double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """avg as exact-decimal sum / count, division done in double on both
    engines (identical operand order => identical result)."""
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(F.lit(1)).cast("double")
    )


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE)"
    )


def sql_phash(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


SQL_QUANTIZED = (
    "list_transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))"
)




TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """SQL-string entry surface (SURVEY §3.3): register every testdata table
    as a temp view so ``spark.sql(...)`` works against the same parquet the
    DataFrame queries read. The ANSI-portable oracle strings then run
    UNMODIFIED on both Spark and DuckDB (pinned in tests/test_sql_entry.py)."""
    for name in TESTDATA_TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
